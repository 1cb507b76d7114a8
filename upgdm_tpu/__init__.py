"""upgdm_tpu — TPU-native framework for unsupervised probing of critical
transitions with generative diffusion models.

A ground-up JAX/Flax/XLA/Pallas rebuild of the capabilities of
curious-child/Unsupervised-probing-Using-Generative-Diffusion-Models
(see SURVEY.md for the structural map of the reference).

Top-level conveniences::

    from upgdm_tpu import diffusion_models, uncertainty_ews, run_training
"""

__version__ = "0.1.0"


def diffusion_models(*args, **kwargs):
    from .models.factory import diffusion_models as _f

    return _f(*args, **kwargs)


def uncertainty_ews(*args, **kwargs):
    from .eval.uncertainty import uncertainty_ews as _f

    return _f(*args, **kwargs)


def run_training(*args, **kwargs):
    from .train.loop import run_training as _f

    return _f(*args, **kwargs)
