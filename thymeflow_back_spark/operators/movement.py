"""Movement segmentation: per-user Viterbi smoothing of a location track.

Distributed shape identical to stay extraction (one shuffle on user, local
DP inside applyInPandas); output is one row per contiguous
stationary/moving segment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..algorithms.trellis import MOVING, STATIONARY, viterbi_states

SEGMENTS_SCHEMA = (
    "user_id long, state string, start_us long, end_us long, n_points int, mean_speed_mps double"
)
_M_PER_DEG_LAT = 111_320.0


def segment_movement(
    locations: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    lon_col: str = "lon",
    lat_col: str = "lat",
    switch_cost: float = 2.0,
) -> DataFrame:
    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        # secondary keys make tie order deterministic (the DP is
        # order-dependent, same discipline as stay extraction)
        pdf = pdf.sort_values([ts_us_col, lon_col, lat_col]).reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame(
                columns=["user_id", "state", "start_us", "end_us", "n_points", "mean_speed_mps"]
            )
        t = pdf[ts_us_col].to_numpy()
        lat = pdf[lat_col].to_numpy(dtype=float)
        lon = pdf[lon_col].to_numpy(dtype=float)
        m_per_deg_lon = _M_PER_DEG_LAT * np.cos(np.radians(np.median(lat)))
        dx = np.diff(lon) * m_per_deg_lon
        dy = np.diff(lat) * _M_PER_DEG_LAT
        dt = np.maximum(np.diff(t) / 1e6, 1e-3)
        speeds = np.sqrt(dx * dx + dy * dy) / dt
        states = viterbi_states(list(speeds), switch_cost=switch_cost)

        rows = []
        seg_start = 0
        for i in range(1, len(states) + 1):
            if i == len(states) or states[i] != states[seg_start]:
                rows.append(
                    {
                        "user_id": pdf[user_col].iloc[0],
                        "state": "stationary" if states[seg_start] == STATIONARY else "moving",
                        "start_us": int(t[seg_start]),
                        "end_us": int(t[i]),
                        "n_points": int(i - seg_start + 1),
                        "mean_speed_mps": float(np.mean(speeds[seg_start:i])),
                    }
                )
                seg_start = i
        return pd.DataFrame(rows)

    return locations.groupBy(user_col).applyInPandas(per_user, SEGMENTS_SCHEMA)
