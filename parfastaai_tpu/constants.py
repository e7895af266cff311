"""Global constants of the ParFastAAI-TPU engine.

The tetramer universe is the set of length-4 amino-acid substrings over the
20-letter alphabet, encoded as integers in ``[0, 20**4)`` (reference:
include/pfaai/interface.hpp:233, NTETRAMERS = 160000).
"""

# Number of possible amino-acid tetramers (20**4).
NTETRAMERS: int = 160000

# Default CSV field separator (reference: src/main.cpp:74, default ",").
DEFAULT_SEPARATOR: str = ","

# Lane width of the TPU vector unit; presence matrices are padded so the
# compacted tetramer axis is a multiple of this (MXU tile = 128x128).
LANE: int = 128

# Default tile edge for the genome-pair tile grid (MXU-friendly).
DEFAULT_TILE: int = 128
