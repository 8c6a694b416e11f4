from .codec import (
    CptvClip,
    CptvFrame,
    CptvHeader,
    CptvReader,
    CptvWriter,
    load_cptv,
)

__all__ = [
    "CptvClip",
    "CptvFrame",
    "CptvHeader",
    "CptvReader",
    "CptvWriter",
    "load_cptv",
]
