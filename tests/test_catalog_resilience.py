"""register_views per-table isolation (VERDICT r2 item #5): one drifted or
unreadable table must not take down the other nine views."""

from __future__ import annotations

import os
import shutil

import pytest

from spark_cherry_shuffle_service_spark.sources.catalog import TABLES, register_views
from tests.conftest import SF_SMOKE


def test_register_views_survives_one_poisoned_table(spark, tmp_path):
    sf_dir = str(tmp_path / "sf_poison")
    os.makedirs(sf_dir)
    for t in TABLES:
        if t == "events":
            # not parquet at all — read must fail for this table only
            with open(f"{sf_dir}/{t}.parquet", "wb") as fh:
                fh.write(b"this is not a parquet file")
        else:
            shutil.copyfile(f"{SF_SMOKE}/{t}.parquet", f"{sf_dir}/{t}.parquet")

    with pytest.warns(RuntimeWarning, match="events"):
        dfs = register_views(spark, sf_dir)

    assert set(dfs) == set(TABLES) - {"events"}
    # the other views are live and queryable via SQL
    got = spark.sql(
        "SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' ORDER BY n_name"
    ).collect()
    assert len(got) > 0
    # restore real views for any later test in the session
    register_views(spark, SF_SMOKE)
