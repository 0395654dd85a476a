from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trendengine_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="trendengine_tests", master="local[4]", shuffle_partitions=4)
    yield s


def make_series(f, n=20, noise=0.02, seed=0):
    """Annual-grain synthetic series: f(yr) + N(0, noise)."""
    yr = np.arange(float(n))
    rng = np.random.RandomState(seed)
    return f(yr) + rng.normal(0.0, noise, n)


#: FIXTURES.md §2 generator recipes (annual trend component)
RECIPES = {
    "no_trend": (lambda yr: np.full(yr.size, 0.45), 0),
    "linear_up": (lambda yr: 0.3 + 0.008 * yr, 1),
    "linear_down": (lambda yr: 0.3 - 0.008 * yr, 1),
    "quadratic": (lambda yr: 0.3 + 0.0168 * yr - 0.0006 * yr**2, 2),
    "cubic": (lambda yr: 0.5 + 0.0002 * (yr - 10) ** 3 - 0.007 * (yr - 10), 3),
    "concealed": (lambda yr: 0.35 + 0.001 * (yr - 9.5) ** 2, -1),
}


def obs_frame(spark, recipes=None, n_years=20, noise=0.02, seed=1):
    """Long-format observations table: one pixel per recipe, annual
    values at Jan-1 timestamps (grid per FIXTURES.md §1)."""
    recipes = recipes or RECIPES
    rows = []
    for i, (name, (f, _)) in enumerate(sorted(recipes.items())):
        lon, lat = 13.0 + 0.072 * i, 52.0
        y = make_series(f, n_years, noise, seed + i)
        for yr in range(n_years):
            rows.append(
                {
                    "series_id": "gimms",
                    "image_id": f"img_{1990 + yr}",
                    "longitude": lon,
                    "latitude": lat,
                    "time": pd.Timestamp(f"{1990 + yr}-07-01"),
                    "value": float(y[yr]),
                    "recipe": name,
                }
            )
    return spark.createDataFrame(pd.DataFrame(rows))
