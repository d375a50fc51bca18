"""Geo helper functions (ExtensionFunctions.hpp:236-600).

The reference ships scalar geo helpers as LLVM-inlined extension functions:
``distance_in_meters`` / ``approx_distance_in_meters`` (haversine over
WGS84 lat/lon) and ``conv_4326_900913_x/y`` (WGS84 → Web-Mercator, used by
the render pipeline). Spark-first: plain Column expressions over built-in
math functions — fully codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6372797.560856  # ExtensionFunctions.hpp distance_in_meters
MERCATOR_R = 6378137.0  # conv_4326_900913 sphere radius


def distance_in_meters(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Haversine great-circle distance in meters (ExtensionFunctions.hpp:236
    distance_in_meters: transcendental haversine on the WGS84 sphere)."""
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    dlat, dlon = rlat2 - rlat1, rlon2 - rlon1
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def approx_distance_in_meters(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Equirectangular approximation (ExtensionFunctions.hpp
    approx_distance_in_meters: cheap flat-earth distance for short spans)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    x = (F.radians(lon2) - F.radians(lon1)) * F.cos((rlat1 + rlat2) / 2)
    y = rlat2 - rlat1
    return F.lit(EARTH_RADIUS_M) * F.sqrt(x * x + y * y)


def conv_4326_900913_x(lon: Column) -> Column:
    """WGS84 longitude → Web-Mercator x (ExtensionFunctions.hpp
    conv_4326_900913_x)."""
    return F.radians(lon) * F.lit(MERCATOR_R)


def conv_4326_900913_y(lat: Column) -> Column:
    """WGS84 latitude → Web-Mercator y (ExtensionFunctions.hpp
    conv_4326_900913_y)."""
    return F.lit(MERCATOR_R) * F.log(F.tan(F.lit(0.25) * F.lit(3.141592653589793) + F.lit(0.5) * F.radians(lat)))
