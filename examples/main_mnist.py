"""Minimal CPU-runnable DDPM example (``torch_ddpm/main_mnist.py`` analog).

Trains the small baseline U-Net on (synthetic or real) MNIST for a few
hundred steps with the N=30 VP diffusion, then draws samples — the smallest
end-to-end slice of the framework.

  python examples/main_mnist.py [--steps 200] [--data-root datasets/mnist]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--data-root", default=None)
    p.add_argument("--out", default="runs/main_mnist")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from unet_design_tpu.tasks import diff_mnist

    cfg = diff_mnist.Config()
    cfg.model.name = "unet"
    cfg.model.num_channels = 32
    cfg.model.channel_mult = [1, 2, 2]
    cfg.data.resolution = 32
    cfg.data.batch_size = 64
    if args.data_root:
        cfg.data.dataset = "mnist"
        cfg.data.root = args.data_root
    cfg.diffusion.N = 30
    cfg.train.num_iterations_list = [args.steps]
    cfg.train.logdir = args.out
    state = diff_mnist.train(cfg)

    import jax
    from unet_design_tpu.process.diffusion import VPDiffusion
    from unet_design_tpu.utils import visualization

    vp = VPDiffusion.create(N=30)
    model = diff_mnist.build_model(cfg, 1)
    imgs = diff_mnist.sample(cfg, model, state.params, vp,
                             jax.random.PRNGKey(1), 1, 32, 1, n_samples=16)
    fig = visualization.plot_sample_grid(imgs, 4, 4, "main_mnist samples")
    os.makedirs(args.out, exist_ok=True)
    fig.savefig(os.path.join(args.out, "samples.png"))
    print("wrote", os.path.join(args.out, "samples.png"))


if __name__ == "__main__":
    main()
