"""Model registry (reference: code/models/__init__.py:14-52).

``create_model(opt)`` maps ``opt['model']`` to a wrapper class:
  'LLFlow'    -> stage-2 flow trainer   (LLFlowModel)
  'VQLLFLOWD' -> stage-3 AFT trainer    (VQLLFLOWDModel)
"""

from __future__ import annotations


def create_model(opt, step=0):
    model_name = opt["model"]
    if model_name == "LLFlow":
        from .llflow_model import LLFlowModel

        m = LLFlowModel(opt, step)
    elif model_name == "VQLLFLOWD":
        from .vqllflowd_model import VQLLFLOWDModel

        m = VQLLFLOWDModel(opt, step)
    else:
        raise NotImplementedError(f"Model [{model_name}] not recognized.")
    return m
