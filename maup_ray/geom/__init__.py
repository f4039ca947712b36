"""From-scratch numpy geometry kernels (no GEOS/shapely).

Submodules: core (representation/measures), wkb (binary transport),
pip (containment predicates), clip (rect clipping + segment math),
boolean (general polygon booleans via planar arrangement), cells
(hierarchical quadkey partitioning), strtree (packed bbox index).
"""

from . import boolean, cells, clip, core, pip, strtree, wkb  # noqa: F401
from .boolean import (  # noqa: F401
    boundary_intersection,
    difference,
    holes,
    holes_of_union,
    intersection,
    intersection_full,
    symmetric_difference,
    union,
    union_all,
)
from .cells import CellGrid  # noqa: F401
from .clip import clip_multipolygon_rect, rect_intersection_area  # noqa: F401
from .core import (  # noqa: F401
    area,
    bounds,
    bounds_many,
    dedup_geom,
    ensure_multi,
    length,
    normalize_polygon,
    perimeter,
    rect,
    representative_point,
    snap_geom,
)
from .pip import covers, point_in_polygon, points_in_multipolygon  # noqa: F401
from .strtree import BBoxTree  # noqa: F401
from .wkb import (  # noqa: F401
    decode,
    decode_polygons,
    encode_lines,
    encode_multipolygon,
    encode_points,
    encode_polygon,
)
