from .logger import AvgTimer, MessageLogger, get_env_info
from .options import parse_options

__all__ = ["AvgTimer", "MessageLogger", "get_env_info", "parse_options"]
