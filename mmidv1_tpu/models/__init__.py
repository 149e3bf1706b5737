from . import sepaihrd, sir, results, interventions

__all__ = ["sepaihrd", "sir", "results", "interventions"]
