from .options import parse, dict_to_nonedict, NoneDict, dict2str, check_resume, save_opt

__all__ = ["parse", "dict_to_nonedict", "NoneDict", "dict2str", "check_resume", "save_opt"]
