from .exceptions import (
    ModelException,
    InvalidParameterException,
    SimulationException,
    ModelConstructionException,
    InterventionException,
    FileIOException,
    DataFormatException,
    InvalidResultException,
    OutOfRangeException,
    CSVReadException,
)
from .logging import get_logger, Logger

__all__ = [
    "ModelException", "InvalidParameterException", "SimulationException",
    "ModelConstructionException", "InterventionException", "FileIOException",
    "DataFormatException", "InvalidResultException", "OutOfRangeException",
    "CSVReadException", "get_logger", "Logger",
]
