from .util import (
    opt_get,
    mkdir,
    mkdirs,
    mkdir_and_rename,
    set_random_seed,
    setup_logger,
    get_resume_paths,
    natsorted,
    get_timestamp,
)
from .timer import Timer, TickTock, ScopeTimer

__all__ = [
    "opt_get",
    "mkdir",
    "mkdirs",
    "mkdir_and_rename",
    "set_random_seed",
    "setup_logger",
    "get_resume_paths",
    "natsorted",
    "get_timestamp",
    "Timer",
    "TickTock",
    "ScopeTimer",
]
