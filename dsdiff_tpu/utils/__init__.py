from . import logging, profiling
from .logging import KVLogger, journal
