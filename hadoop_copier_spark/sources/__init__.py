"""Sources/sinks beyond the table formats: binary files, multimodal rows."""

from .binary import read_binary_dir  # noqa: F401
from .multimodal import (  # noqa: F401
    MULTIMODAL_SCHEMA,
    decode_and_featurize,
    make_multimodal_rows,
)
