from .tableaus import DOPRI5, CASH_KARP, FEHLBERG78, RK4, TABLEAUS, Tableau, get_tableau
from .integrate import (
    integrate_times,
    integrate_times_fixed,
    fold_times,
    fold_times_fixed,
    rk_step,
)

__all__ = [
    "DOPRI5", "CASH_KARP", "FEHLBERG78", "RK4", "TABLEAUS", "Tableau", "get_tableau",
    "integrate_times", "integrate_times_fixed", "fold_times", "fold_times_fixed",
    "rk_step",
]
