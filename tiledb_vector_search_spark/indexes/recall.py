"""Operating-point resolution over a persisted recall curve.

ONE pure function shared by every surface that answers
``recall_target`` queries — the DataFrame path
(``Index.resolve_recall_target``), the pyarrow SQL-TVF twin
(``sql/tvf.search_index_files``), and the streaming search path — so
the cheapest-gated pick (sort key, tie-break, error contract) cannot
drift between surfaces.  No Spark dependency: the curve is the plain
dict persisted in the snapshot's meta entry.
"""

from __future__ import annotations


NO_CURVE_ERROR = (
    "no measured recall curve on this snapshot: build with "
    "ingest(..., recall_curve=True) or call measure_recall_curve() "
    "once, then query with recall_target"
)


def resolve_curve_point(curve: dict | None, recall_target: float) -> dict:
    """The CHEAPEST measured setting whose recall clears the target.

    Sort key: (measured sec asc, recall desc, params lexicographic) —
    among settings tied on cost, the higher-recall one wins, and the
    params themselves break exact ties deterministically.  Raises
    ``ValueError`` when no curve is persisted (measure first) or when
    the target exceeds the curve's measured ceiling.
    """
    if not curve:
        raise ValueError(NO_CURVE_ERROR)
    pts = sorted(
        curve["points"],
        key=lambda p: (
            p["sec"],
            -p["recall_at_k"],
            sorted(p["params"].items()),
        ),
    )
    for p in pts:
        if p["recall_at_k"] >= recall_target:
            return dict(p["params"])
    best = max(p["recall_at_k"] for p in curve["points"])
    raise ValueError(
        f"recall_target {recall_target} exceeds this index's measured "
        f"ceiling {best} (k={curve['k']}, nq={curve['nq']}); rebuild "
        "with more partitions probed by default, an overlay, or a "
        "less lossy index type"
    )
