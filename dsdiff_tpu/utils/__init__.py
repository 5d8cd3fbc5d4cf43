from . import logging, misc, profiling
from .logging import KVLogger, journal
