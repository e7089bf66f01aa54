from .scalars import (  # noqa: F401
    UnknownDataConvertOperation,
    clamp,
    hmac_sha256,
    convert_data,
    next_month_start,
    pentad_of_day,
    pentad_start_day,
    sinusoidal_xy,
    tile_id,
    wind_speed,
)
