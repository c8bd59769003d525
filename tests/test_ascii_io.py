"""Ascii sidecar readers (S3/S4) against files in the reference's formats
(FIXTURES.md §5)."""

from __future__ import annotations

from wfc3_cte_monitor_spark.sources.ascii_io import (
    read_coo,
    read_mag,
    read_master_cat,
    read_slope_file,
)


def test_read_master_cat(spark, tmp_path):
    p = tmp_path / "ngc104.cat"
    p.write_text("1 100.5 200.5 6.01 -72.02\n2 300.0 400.0 6.02 -72.03\n")
    rows = read_master_cat(spark, str(p)).collect()
    assert len(rows) == 2
    assert rows[0].master_id == 1 and abs(rows[0].xpix - 100.5) < 1e-9


def test_read_coo_with_header(spark, tmp_path):
    p = tmp_path / "image1.coo"
    p.write_text(
        "# master_id\textr_id\textr_xpix\textr_ypix\textr_ra\textr_dec\n"
        "5\t1\t10.0\t20.0\t6.0\t-72.0\n"
    )
    rows = read_coo(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0].master_id == 5


def test_read_mag_long_format(spark, tmp_path):
    p = tmp_path / "image1.mag"
    lines = [f"1\t{r}\t{100.0 * r}\t50.0\t60.0\t1.5\t{1.5 * 3.14 * r * r}" for r in (2, 3, 5)]
    p.write_text("\n".join(lines) + "\n")
    df = read_mag(spark, str(p))
    assert df.count() == 3
    assert {r.radius for r in df.collect()} == {2, 3, 5}


def test_read_slope_file(spark, tmp_path):
    p = tmp_path / "pair_slopes.txt"
    p.write_text(
        "# slope\tslope_stddev\tnum_points\tlow_bin\thigh_bin\n"
        "4.1e-05\t1.2e-05\t120\t250\t500\n"
        "0\t0\t0\t8000\t32000\n"
    )
    rows = read_slope_file(spark, str(p)).orderBy("low_bin").collect()
    assert len(rows) == 2
    assert abs(rows[0].slope - 4.1e-05) < 1e-12 and rows[0].num_points == 120
    assert rows[1].num_points == 0
