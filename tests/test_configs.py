"""The shipped recipe YAMLs must parse into valid task configs."""
import glob

import pytest

from unet_design_tpu.tasks import cond_pde, diff_cifar, diff_mnist, pde, wmh
from unet_design_tpu.utils import config as config_lib

CASES = {
    "configs/cond_pde_navierstokes2d.yaml": cond_pde.Config,
    "configs/diff_cifar_staged.yaml": diff_cifar.Config,
    "configs/diff_mnist_triangular.yaml": diff_mnist.Config,
    "configs/pde_navierstokes2d.yaml": pde.Config,
    "configs/pde_ns2d_quickstart.yaml": pde.Config,
    "configs/pde_ns2d_table1.yaml": pde.Config,
    "configs/pde_shallowwater2d_1day.yaml": pde.Config,
    "configs/pde_shallowwater2d_2day.yaml": pde.Config,
    "configs/wmh.yaml": wmh.Config,
}


@pytest.mark.parametrize("path", sorted(CASES))
def test_config_parses(path):
    cfg = config_lib.from_yaml(CASES[path], path)
    assert cfg is not None
    if hasattr(CASES[path], "check_config"):
        pass
    # validation functions where present
    mod = {diff_cifar.Config: diff_cifar, diff_mnist.Config: diff_mnist}.get(
        CASES[path])
    if mod is not None:
        mod.check_config(cfg)


def test_all_yaml_files_covered():
    files = set(glob.glob("configs/*.yaml"))
    assert files == set(CASES), files ^ set(CASES)
