"""Stay-point extraction as a distributed operator.

One shuffle on user_id, then per-user time-sorted clustering inside
applyInPandas (the algorithm is inherently order-dependent — SURVEY.md §2.7
— so it cannot be a window/SQL expression; this is the sanctioned Pandas-UDF
escape hatch). Each group is one user's track: memory is bounded by track
length per user, not dataset size. For the streaming form, the same
function body slots into applyInPandasWithState keyed by user.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..algorithms import staypoints as algo

STAYS_SCHEMA = (
    "user_id long, start_us long, end_us long, lon double, lat double, n_obs int"
)


def extract_stays(
    locations: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    lon_col: str = "lon",
    lat_col: str = "lat",
    accuracy_col: str = "accuracy_m",
    min_stay_us: int = algo.MIN_STAY_US,
    window_us: int = algo.WINDOW_US,
    lam: float = algo.LAMBDA,
) -> DataFrame:
    """locations(user, ts_us, lon, lat, accuracy_m) → stays per user."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        # secondary keys make tie order deterministic across runs (the fold
        # is order-dependent; equal-timestamp rows would otherwise keep
        # arbitrary partition order)
        pdf = pdf.sort_values([ts_us_col, lon_col, lat_col]).reset_index(drop=True)
        stays = algo.extract_stays(
            pdf[ts_us_col].to_numpy(),
            pdf[lon_col].to_numpy(dtype=float),
            pdf[lat_col].to_numpy(dtype=float),
            pdf[accuracy_col].to_numpy(dtype=float),
            min_stay_us=min_stay_us,
            window_us=window_us,
            lam=lam,
        )
        user = pdf[user_col].iloc[0] if len(pdf) else None
        return pd.DataFrame(
            {
                "user_id": [user] * len(stays),
                "start_us": [s.start_us for s in stays],
                "end_us": [s.end_us for s in stays],
                "lon": [s.lon for s in stays],
                "lat": [s.lat for s in stays],
                "n_obs": [s.n_obs for s in stays],
            }
        )

    return locations.groupBy(user_col).applyInPandas(per_user, STAYS_SCHEMA)
