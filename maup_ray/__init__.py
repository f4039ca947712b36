"""maup_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch reimplementation of the query/data-processing capabilities
of mggg/maup (reference studied at /root/reference, v2.0.3) as
``ray.data.Dataset`` pipelines: map_batches over zero-copy Arrow,
broadcast small-side indexes held in actor pools, keyed shuffles only
for genuinely wide steps. See SURVEY.md for the operator inventory and
design rationale.
"""

from .ops.adjacencies import adjacencies, count_overlaps, islands  # noqa: F401
from .ops.assign import (  # noqa: F401
    AssigmentWarning,
    assign,
    assign_by_area,
    assign_by_covering,
    assign_to_max,
)
from .ops.intersections import intersections  # noqa: F401
from .ops.prorate import normalize, prorate  # noqa: F401
from .ops.repair import (  # noqa: F401
    absorb_by_shared_perimeter,
    apply_func_to_polygon_parts,
    autorepair,
    close_gaps,
    count_holes,
    crop_to,
    doctor,
    expand_to,
    holes_of_union,
    make_valid,
    quick_repair,
    remove_repeated_vertices,
    resolve_overlaps,
    snap_to_grid,
)
from .ops.rook_to_queen import small_rook_to_queen  # noqa: F401
from .state.target_index import TargetIndex as IndexedGeometries  # noqa: F401
from .ops.smart_repair import smart_repair  # noqa: F401
from .progress import progress  # noqa: F401

# training-data-pipeline family (beyond the reference surface; each is
# documented in its module and exercised by a queries() entry)
from .ops.curate import (  # noqa: F401
    grouped_distinct_count,
    grouped_quantiles,
    hash_sample,
    top_k_per_group,
)
from .ops.join import equi_join  # noqa: F401
from .ops.agg import grouped_sum_count, profile_columns  # noqa: F401
from .ops.sessions import sessionize  # noqa: F401
from .text.dedup import exact_dedup  # noqa: F401
from .text.bpe import apply_bpe, train_bpe, word_frequencies  # noqa: F401
from .text.analysis import (  # noqa: F401
    chunk_text,
    frequent_ngrams,
    quality_scores,
    redact_pii,
)
from .media.image import (  # noqa: F401
    image_near_dup,
    signature_near_dup,
    video_near_dup,
)

__version__ = "0.1.0"
