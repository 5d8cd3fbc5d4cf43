from .logging import KVLogger, journal
