from .runner import run_mapper, MapperConfig

__all__ = ["run_mapper", "MapperConfig"]
