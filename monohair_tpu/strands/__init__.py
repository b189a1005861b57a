"""Strand generation: batched field tracing, segment connection, scalp
attachment, Laplacian smoothing."""

from .trace import (TraceResult, trace_bidirectional, trace_from_scalp,  # noqa: F401
                    generate_segments, generate_guide_and_segments, strands_to_list)
from .smooth import smooth_strands_padded, smooth_strand_list  # noqa: F401
