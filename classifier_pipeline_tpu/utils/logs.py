import logging
import sys


def init_logging(level=logging.INFO):
    """reference ml_tools/logs.py init_logging."""
    logging.basicConfig(
        stream=sys.stderr,
        level=level,
        format="%(asctime)s %(levelname)7s %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
