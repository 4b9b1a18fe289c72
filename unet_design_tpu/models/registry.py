"""Model registry — mirrors ``pdearena/pdearena/models/registry.py:11-443``.

Every name from the reference ``MODEL_REGISTRY`` maps to a flax module class
plus init kwargs.  ``build_model`` injects the PDE/task-dependent arguments
(field counts, time history/future, activation) exactly where the reference's
``get_model`` does (``pdearena/models/pdemodel.py:26-68``), including the
special-cased Multi-ResNet arguments for ``Unetbase-64_G``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from unet_design_tpu.models.modern_unet import ModernUnet
from unet_design_tpu.models.resnet import PDEResNet
from unet_design_tpu.models.unet2015 import Unet2015
from unet_design_tpu.models.unetbase import Unetbase, UnetbaseG
from unet_design_tpu.models.uno import UNO


def _fourier_resnet(hidden, modes, num_blocks):
    return dict(cls=PDEResNet,
                init_args=dict(hidden_channels=hidden, norm=False,
                               block="fourier", num_blocks=num_blocks,
                               modes1=modes, modes2=modes))


def _funet(hidden=64, modes=16, n_fourier_layers=2, mid_attn=False,
           use1x1=False, mode_scaling=True):
    return dict(cls=ModernUnet,
                init_args=dict(hidden_channels=hidden, norm=True,
                               modes1=modes, modes2=modes,
                               n_fourier_layers=n_fourier_layers,
                               mid_attn=mid_attn, use1x1=use1x1,
                               mode_scaling=mode_scaling))


MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {
    # FNO family (ResNet trunk with FourierBasicBlocks)
    "FNO-128-8m": _fourier_resnet(128, 8, (1, 1, 1, 1)),
    "FNO-128-16m": _fourier_resnet(128, 16, (1, 1, 1, 1)),
    "FNOs-128-32m": _fourier_resnet(128, 32, (1, 1)),
    "FNOs-128-16m": _fourier_resnet(128, 16, (1, 1)),
    "FNOs-64-32m": _fourier_resnet(64, 32, (1, 1)),
    "FNOs-96-32m": _fourier_resnet(96, 32, (1, 1)),
    # UNO
    "UNO-64": dict(cls=UNO, init_args=dict(hidden_channels=64)),
    "UNO-128": dict(cls=UNO, init_args=dict(hidden_channels=128)),
    # Unet2015
    "Unet2015-64": dict(cls=Unet2015, init_args=dict(hidden_channels=64)),
    "Unet2015-128": dict(cls=Unet2015, init_args=dict(hidden_channels=128)),
    # Unetbase
    "Unetbase-64": dict(cls=Unetbase, init_args=dict(hidden_channels=64)),
    "Unetbase-64_G": dict(cls=UnetbaseG, init_args=dict(hidden_channels=64)),
    "Unetbase-128": dict(cls=Unetbase, init_args=dict(hidden_channels=128)),
    # Modern U-Net
    "Unetmod-64": dict(cls=ModernUnet,
                       init_args=dict(hidden_channels=64, norm=True)),
    "Unetmodattn-64": dict(cls=ModernUnet,
                           init_args=dict(hidden_channels=64, norm=True,
                                          mid_attn=True)),
    "Unetmod-64-1x1": dict(cls=ModernUnet,
                           init_args=dict(hidden_channels=64, norm=True,
                                          use1x1=True)),
    "Unetmodattn-64-1x1": dict(cls=ModernUnet,
                               init_args=dict(hidden_channels=64, norm=True,
                                              mid_attn=True, use1x1=True)),
    # U-FNet variants
    "U-FNet1-8m": _funet(modes=8, n_fourier_layers=1),
    "U-FNet1-16m": _funet(modes=16, n_fourier_layers=1),
    "U-FNet1-8m-1x1": _funet(modes=8, n_fourier_layers=1, use1x1=True),
    "U-FNet1-16m-1x1": _funet(modes=16, n_fourier_layers=1, use1x1=True),
    "U-FNet2-8m": _funet(modes=8, n_fourier_layers=2),
    "U-FNet2-8m-1x1": _funet(modes=8, n_fourier_layers=2, use1x1=True),
    "U-FNet2-8mc": _funet(modes=8, n_fourier_layers=2, mode_scaling=False),
    "U-FNet2-16m": _funet(modes=16, n_fourier_layers=2),
    "U-FNet2-16m-1x1": _funet(modes=16, n_fourier_layers=2, use1x1=True),
    "U-FNet3-8m": _funet(modes=8, n_fourier_layers=3),
    "U-FNet3-8m-1x1": _funet(modes=8, n_fourier_layers=3, use1x1=True),
    "U-FNet3-16m": _funet(modes=16, n_fourier_layers=3),
    "U-FNet3-16m-1x1": _funet(modes=16, n_fourier_layers=3, use1x1=True),
    "U-FNet2-16mc": _funet(modes=16, n_fourier_layers=2, mode_scaling=False),
    "U-FNet2attn-16m": _funet(modes=16, n_fourier_layers=2, mid_attn=True),
    "U-FNet2attn-16m-1x1": _funet(modes=16, n_fourier_layers=2, mid_attn=True,
                                  use1x1=True),
    # ResNet family
    "ResNet-128": dict(cls=PDEResNet,
                       init_args=dict(hidden_channels=128, norm=True,
                                      block="basic", num_blocks=(1, 1, 1, 1))),
    "ResNet-256": dict(cls=PDEResNet,
                       init_args=dict(hidden_channels=256, norm=True,
                                      block="basic", num_blocks=(1, 1, 1, 1))),
    "DilResNet-128": dict(cls=PDEResNet,
                          init_args=dict(hidden_channels=128, norm=False,
                                         block="dilated",
                                         num_blocks=(1, 1, 1, 1))),
    "DilResNet-128-norm": dict(cls=PDEResNet,
                               init_args=dict(hidden_channels=128, norm=True,
                                              block="dilated",
                                              num_blocks=(1, 1, 1, 1))),
}


def _cond_funet(hidden=64, modes=16, n_fourier_layers=2, mid_attn=False,
                use_scale_shift_norm=False):
    from unet_design_tpu.models.conditioned.modern_unet import CondModernUnet
    return dict(cls=CondModernUnet,
                init_args=dict(hidden_channels=hidden, norm=True,
                               modes1=modes, modes2=modes,
                               n_fourier_layers=n_fourier_layers,
                               mid_attn=mid_attn,
                               use_scale_shift_norm=use_scale_shift_norm))


def _cond_registry() -> Dict[str, Dict[str, Any]]:
    from unet_design_tpu.models.conditioned.modern_unet import CondModernUnet
    from unet_design_tpu.models.conditioned.resnet import CondPDEResNet
    return {
        "FNO-128-16m": dict(cls=CondPDEResNet,
                            init_args=dict(hidden_channels=128, norm=False,
                                           num_blocks=(1, 1, 1, 1),
                                           modes1=16, modes2=16)),
        "Unetmod-64": dict(cls=CondModernUnet,
                           init_args=dict(hidden_channels=64, norm=True,
                                          use_scale_shift_norm=False)),
        "Unetmod-64-adagn": dict(cls=CondModernUnet,
                                 init_args=dict(hidden_channels=64, norm=True,
                                                use_scale_shift_norm=True)),
        "Unetmodattn-64": dict(cls=CondModernUnet,
                               init_args=dict(hidden_channels=64, norm=True,
                                              mid_attn=True,
                                              use_scale_shift_norm=False)),
        "Unetmodattn-64-adagn": dict(cls=CondModernUnet,
                                     init_args=dict(hidden_channels=64,
                                                    norm=True, mid_attn=True,
                                                    use_scale_shift_norm=True)),
        "U-FNet1-16m": _cond_funet(n_fourier_layers=1),
        "U-FNet2-16m": _cond_funet(n_fourier_layers=2),
        "U-FNet1-16m-adagn": _cond_funet(n_fourier_layers=1,
                                         use_scale_shift_norm=True),
        "U-FNet2-16m-adagn": _cond_funet(n_fourier_layers=2,
                                         use_scale_shift_norm=True),
    }


COND_MODEL_REGISTRY: Dict[str, Dict[str, Any]] = _cond_registry()


def build_cond_model(name: str, n_scalar_components: int,
                     n_vector_components: int, time_history: int,
                     time_future: int, activation: str = "gelu",
                     param_conditioning: Optional[str] = None, **overrides):
    """Instantiate a conditioned registry model (``COND_MODEL_REGISTRY``,
    ``pdearena/models/registry.py:353-443``)."""
    spec = COND_MODEL_REGISTRY[name]
    kwargs = dict(spec["init_args"])
    n_fields = n_scalar_components + 2 * n_vector_components
    kwargs.update(n_output_fields=n_fields, time_future=time_future,
                  activation=activation,
                  param_conditioning=param_conditioning)
    kwargs.update(overrides)
    return spec["cls"](**kwargs)


def _build_from_class_path(name: str, n_scalar_components: int,
                           n_vector_components: int, time_history: int,
                           time_future: int, activation: str, **overrides):
    """Custom-model fallback — ``pdemodel.py:56-66`` instantiates an
    arbitrary user ``class_path`` (with a warning) when the name is not in
    the registry (tested by ``pdearena/tests/test_custom_model.py:8-40``).
    Here the dotted name itself is the class path; the task-injected
    arguments are still provided and ``overrides`` carries the remaining
    init args.
    """
    import importlib
    import logging

    module_name, _, cls_name = name.rpartition(".")
    try:
        cls = getattr(importlib.import_module(module_name), cls_name)
    except (ImportError, AttributeError) as e:
        raise KeyError(f"Model {name!r} not in registry and not importable "
                       f"as a class path: {e}") from e
    logging.getLogger(__name__).warning(
        "Model %r not found in registry. Using class-path fallback. "
        "Best to add your model to the registry.", name)
    n_fields = n_scalar_components + 2 * n_vector_components
    kwargs = dict(n_output_fields=n_fields, time_future=time_future,
                  activation=activation)
    kwargs.update(overrides)
    return cls(**kwargs)


def build_model(name: str,
                n_scalar_components: int,
                n_vector_components: int,
                time_history: int,
                time_future: int,
                activation: str = "gelu",
                registry: Optional[Dict[str, Dict[str, Any]]] = None,
                **overrides):
    """Instantiate a registry model with task-injected arguments.

    Mirrors ``get_model`` (``pdemodel.py:26-68``): field counts, time window
    and activation are injected; for the Multi-ResNet ``Unetbase-64_G`` the
    dwt/multi-res/staged arguments are additionally forwarded via
    ``overrides`` (``pdemodel.py:40-54``).
    """
    registry = registry if registry is not None else MODEL_REGISTRY
    if name not in registry:
        if "." in name:
            return _build_from_class_path(
                name, n_scalar_components, n_vector_components, time_history,
                time_future, activation, **overrides)
        raise KeyError(
            f"Model {name!r} not in registry (pass a dotted "
            "'module.path.Class' name for the custom-model fallback)")
    spec = registry[name]
    kwargs = dict(spec["init_args"])
    n_fields = n_scalar_components + 2 * n_vector_components
    kwargs.update(n_output_fields=n_fields, time_future=time_future,
                  activation=activation)
    kwargs.update(overrides)
    return spec["cls"](**kwargs)
