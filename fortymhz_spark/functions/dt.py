"""DT-domain derived columns.

The reference stores raw LHC counters and never derives absolute time
(SURVEY.md §1.2); the natural event-time for watermarking is

    t = (ORBIT_CNT * 3564 + BX_COUNTER + TDC_MEAS / 30) * 25 ns

Pure column arithmetic — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fortymhz_spark.schemas import BX_PER_ORBIT, SECONDS_PER_BX, TDC_COUNTS_PER_BX


def event_time_seconds(
    orbit: Column | str = "ORBIT_CNT",
    bx: Column | str = "BX_COUNTER",
    tdc: Column | str = "TDC_MEAS",
) -> Column:
    """Absolute event time in seconds since counter epoch (double)."""
    orbit = F.col(orbit) if isinstance(orbit, str) else orbit
    bx = F.col(bx) if isinstance(bx, str) else bx
    tdc = F.col(tdc) if isinstance(tdc, str) else tdc
    bx_total = (
        orbit.cast("double") * F.lit(float(BX_PER_ORBIT))
        + bx.cast("double")
        + tdc.cast("double") / F.lit(float(TDC_COUNTS_PER_BX))
    )
    return bx_total * F.lit(SECONDS_PER_BX)


def is_physical_hit(
    head: Column | str = "HEAD", channel: Column | str = "TDC_CHANNEL"
) -> Column:
    """Physical-hit predicate: HEAD == 2 and a physical wire channel."""
    head = F.col(head) if isinstance(head, str) else head
    channel = F.col(channel) if isinstance(channel, str) else channel
    return (head == 2) & (channel <= 128)
