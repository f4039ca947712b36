from .adjacencies import adjacencies, count_overlaps, islands  # noqa: F401
from .assign import assign, assign_by_area, assign_by_covering  # noqa: F401
from .intersections import intersections  # noqa: F401
from .prorate import normalize, prorate  # noqa: F401
