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
from . import fileutils

__all__ = [
    "ModelException", "InvalidParameterException", "SimulationException",
    "ModelConstructionException", "InterventionException", "FileIOException",
    "DataFormatException", "InvalidResultException", "OutOfRangeException",
    "CSVReadException", "get_logger", "Logger", "fileutils",
]
