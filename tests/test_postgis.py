"""Unit tests for the PostGIS baseline SQL builders (no database needed).

The reference builds these statements in
query/src/bin/run_postgis_queries.rs:67-127 (bbox patch/exact) and :186-220
(class); here we assert the generated SQL matches those shapes exactly.
"""

from adhoc_queries_pointclouds_tpu import postgis
from adhoc_queries_pointclouds_tpu.experiments import AABBS
from adhoc_queries_pointclouds_tpu.utils.aabb import AABB


def test_envelope_uses_xy_only():
    b = AABB((1.5, -2.0, 10.0), (3.25, 4.0, 99.0))
    env = postgis._envelope(b)
    assert env == "ST_MakeEnvelope(1.5, -2.0, 3.25, 4.0)"
    assert "10.0" not in env and "99.0" not in env  # z never enters the 2D envelope


def test_patch_bbox_sql():
    b = AABB((0.0, 1.0, 2.0), (3.0, 4.0, 5.0))
    sql = postgis.patch_bbox_sql("ca13", b)
    assert sql == (
        "SELECT sum(PC_NumPoints(pa)) FROM ca13 "
        "WHERE PC_Intersects(pa, ST_MakeEnvelope(0.0, 1.0, 3.0, 4.0));"
    )


def test_exact_bbox_sql_intersects_and_intersection_share_envelope():
    b = AABBS["doc"]["s"]
    sql = postgis.exact_bbox_sql("doc", b)
    env = postgis._envelope(b)
    # PC_Intersection inside the sum, PC_Intersects in the WHERE, same envelope
    assert sql.count(env) == 2
    assert sql.startswith(f"SELECT sum(PC_NumPoints(PC_Intersection(pa, {env}))) FROM doc")
    assert sql.endswith(f"WHERE PC_Intersects(pa, {env});")


def test_class_sql():
    sql = postgis.class_sql("doc", 6)
    assert sql == (
        "SELECT sum(PC_NumPoints(PC_FilterEquals(pa, 'Classification', 6))) "
        "FROM doc;"
    )


def test_latex_row_format():
    row = postgis.latex_row("ca13\\_s\\_patch", "ca13", [2.0, 1.0, 3.0, 1.0, 2.0])
    # median of the five times is 2.0 s; 2608 Mpts / 2 s = 1304 Mpts/s
    assert row.startswith("ca13\\_s\\_patch & $2.00s \\pm ")
    assert "$1304.00$\\,Mpts/s \\\\" in row


def test_paper_query_grid_covered():
    """All nine bbox cells and both class queries build valid SQL."""
    for dataset, boxes in AABBS.items():
        table = postgis.TABLE_NAMES[dataset]
        for size in ("s", "l", "xl"):
            for fn in (postgis.patch_bbox_sql, postgis.exact_bbox_sql):
                sql = fn(table, boxes[size])
                assert sql.startswith("SELECT sum(") and sql.endswith(";")
    for cls in (6, 19):
        assert f"{cls})))" in postgis.class_sql("ca13", cls)
