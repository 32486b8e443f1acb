"""Native contig-to-reference aligner: minimizer seeding, chaining, banded
affine-gap extension (device DP kernel), =/X CIGAR emission.

Replaces the reference's external minimap2/LRA binaries
(rules/align.snakefile:176-221) with an engine-integrated, batched design.
"""

from .core import Aligner  # noqa: F401
