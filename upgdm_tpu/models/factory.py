"""Model factory — string dispatch parity with the reference
(/root/reference/models/models.py:5-32)."""
from __future__ import annotations

__all__ = ["diffusion_models"]


def diffusion_models(task_model: str, net_param: dict, **kwargs):
    train_model_select = kwargs.get("train_model_select")
    seed = kwargs.get("seed", 0)
    if task_model == "DiffSTG":
        from .diffstg import DiffSTGModel

        return DiffSTGModel(net_param=net_param, seed=seed)
    if task_model == "DiffusionTS":
        from .diffusionts import DiffusionTSModel

        return DiffusionTSModel(net_param=net_param, seed=seed)
    if task_model == "TMDM":
        from .tmdm import TMDMModel

        return TMDMModel(net_param=net_param, seed=seed)
    if task_model == "NsDiff_spatial":
        from .nsdiff_spatial import NsDiffSpatialModel

        return NsDiffSpatialModel(
            net_param=net_param,
            train_model_select=train_model_select or "NsDiff_model",
            pretrain_f_path=net_param.get("pretrain_f_path") or None,
            pretrain_g_path=net_param.get("pretrain_g_path") or None,
            seed=seed,
        )
    if task_model == "NsDiff":
        from .nsdiff import NsDiffModel

        return NsDiffModel(
            net_param=net_param,
            train_model_select=train_model_select or "NsDiff_model",
            pretrain_f_path=net_param.get("pretrain_f_path") or None,
            pretrain_g_path=net_param.get("pretrain_g_path") or None,
            seed=seed,
        )
    if task_model == "NsDiff_model_variants":
        from .nsdiff import NsDiffVariants

        return NsDiffVariants(
            net_param=net_param, train_model_select=train_model_select, seed=seed
        )
    raise ValueError(
        "the definition don't exit\n\tyou can define it before using it"
    )
