from .config import EvflyConfig, parse_config_file, argparsing

__all__ = ["EvflyConfig", "parse_config_file", "argparsing"]
