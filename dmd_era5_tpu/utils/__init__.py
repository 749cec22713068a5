from dmd_era5_tpu.utils.labels import Coord, Field, FieldSet

__all__ = ["Coord", "Field", "FieldSet"]
