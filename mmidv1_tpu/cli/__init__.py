"""Application layer (reference L6): the seven executables as CLI modules.

| reference executable                  | here                                        |
|---------------------------------------|---------------------------------------------|
| sepaihrd_age_structured_main          | python -m mmidv1_tpu.cli.sepaihrd_main      |
| sepaihrd_objective_benchmark          | python -m mmidv1_tpu.cli.benchmark_main     |
| sir_age_structured_main               | python -m mmidv1_tpu.cli.sir_age_structured_main |
| sir_age_structured_calibration_demo   | python -m mmidv1_tpu.cli.sir_calibration_demo |
| sir_model / sir_pop_var / sir_stochastic | python -m mmidv1_tpu.cli.sir_mains {deterministic,popvar,stochastic} |

Or dispatch through ``python -m mmidv1_tpu.cli <name> [args...]``.
"""

COMMANDS = {
    "sepaihrd_age_structured_main": "mmidv1_tpu.cli.sepaihrd_main",
    "sepaihrd_objective_benchmark": "mmidv1_tpu.cli.benchmark_main",
    "sir_age_structured_main": "mmidv1_tpu.cli.sir_age_structured_main",
    "sir_age_structured_calibration_demo": "mmidv1_tpu.cli.sir_calibration_demo",
    "sir_model": ("mmidv1_tpu.cli.sir_mains", ["deterministic"]),
    "sir_pop_var": ("mmidv1_tpu.cli.sir_mains", ["popvar"]),
    "sir_stochastic": ("mmidv1_tpu.cli.sir_mains", ["stochastic"]),
}
