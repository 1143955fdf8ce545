"""Training CLI — config-file driven like reference train.py:56-165.

Reads ``config.yml`` (hyperparameters + data paths, reference
config.yml:1-20) and ``dataset_info.yml`` found next to the data
(reference train.py:76-79), runs the two-pass flow:

  pass 1: dataset mean/std statistics (reference train.py:94-127)
  pass 2: full training with best-train/best-val checkpoints

Additions over the reference: ``--resume`` continues from the last full
checkpoint (optimizer state included); ``--synthetic`` trains from the
on-device pair renderer instead of files (no dataset on disk needed);
``--bf16`` enables bfloat16 activations.
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def main(argv=None):
    import yaml
    import jax
    import jax.numpy as jnp

    from ..data import augment as A
    from ..data.dataset import DRComposite, PairDataset, SyntheticPairs
    from ..models import tracknet
    from ..train import trainer as tr
    from ..train import checkpoint as ck
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()  # warm start across restarts/resumes

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="config.yml")
    parser.add_argument("--output_path", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--synthetic", action="store_true",
                        help="train from the on-device pair renderer")
    parser.add_argument("--dr", action="store_true",
                        help="with --synthetic: composite the observed "
                             "branch over randomized valid-depth "
                             "backgrounds + occluders on device "
                             "(data/dataset.py::DRComposite) — the "
                             "robustness recipe the reference gets from "
                             "Blender DR scenes")
    parser.add_argument("--model_path", default=None,
                        help="mesh for --synthetic mode")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)
    if args.dr and not args.synthetic:
        parser.error("--dr requires --synthetic (DR compositing happens "
                     "in the on-device pair sampler; disk datasets carry "
                     "their own backgrounds)")

    with open(args.config) as f:
        config = yaml.safe_load(f)
    data_path = config["data_path"]
    validation_path = config["validation_path"]
    output_path = args.output_path or os.path.join(
        os.path.dirname(os.path.abspath(args.config)), "train_output"
    )
    os.makedirs(output_path, exist_ok=True)

    info_path = os.path.join(data_path, "..", "dataset_info.yml")
    with open(info_path) as f:
        dataset_info = yaml.safe_load(f)
    shutil.copy(info_path, os.path.join(output_path, "dataset_info.yml"))
    with open(os.path.join(output_path, "config_backup.yml"), "w") as f:
        yaml.dump(config, f)

    from ..utils.config import train_config_from_yaml

    res = int(dataset_info["resolution"])
    overrides = {"epochs": int(args.epochs)} if args.epochs else {}
    cfg = train_config_from_yaml(config, dataset_info, **overrides)

    # -- data sources --------------------------------------------------
    if args.synthetic:
        from ..render import mesh as mesh_mod
        from ..render import rasterizer as rz
        from ..core.camera import Camera

        mesh = mesh_mod.load_mesh(
            args.model_path or dataset_info["models"][0]["model_path"]
        )
        cam = Camera.from_dict(dataset_info["camera"])
        width = mesh.diameter * 1000 * (1 + dataset_info.get("boundingbox", 10) / 100)
        synth = SyntheticPairs(
            rz.upload(mesh), cam.K, resolution=res, object_width_mm=width,
            max_trans=cfg.trans_normalizer,
            max_rot_deg=float(dataset_info["max_rotation"]),
            dr=DRComposite() if args.dr else None,
        )
        spe = int(dataset_info.get("train_samples", 200000)) // cfg.batch_size
        val_batches_n = max(1, int(dataset_info.get("val_samples", 2000))
                            // cfg.batch_size)

        def train_batches(epoch):
            key = jax.random.PRNGKey(epoch)
            for i in range(spe):
                yield synth.sample_batch(jax.random.fold_in(key, i),
                                         cfg.batch_size)

        def val_batches(epoch):
            key = jax.random.PRNGKey(10_000_019)
            for i in range(val_batches_n):
                yield synth.sample_batch(jax.random.fold_in(key, i),
                                         cfg.batch_size)

        mean_src = train_batches(999)
        steps_per_epoch = spe
    else:
        train_ds = PairDataset(data_path, resolution=res)
        val_ds = PairDataset(validation_path, resolution=res)
        print(f"#train={len(train_ds)} #val={len(val_ds)}")
        steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)

        def train_batches(epoch):
            return train_ds.batches(cfg.batch_size, shuffle=True, seed=epoch)

        def val_batches(epoch):
            # pad the epoch-tail batch so eval_step compiles exactly once
            # (losses stay exact: eval_step masks the padding).
            return val_ds.batches(cfg.batch_size, shuffle=False,
                                  drop_last=False, pad_to_batch=True)

        mean_src = train_ds.batches(cfg.batch_size, shuffle=False)

    # -- pass 1: mean/std (reference train.py:94-127) --------------------
    mean_npy = os.path.join(output_path, "mean.npy")
    if os.path.exists(mean_npy) and args.resume:
        mean = np.load(mean_npy)
        std = np.load(os.path.join(output_path, "std.npy"))
    else:
        print("Computing mean/std ...")
        mean, std = tr.compute_mean_std(mean_src, cfg)
        print("images_mean", mean)
        print("images_std", std)

    # -- pass 2: train ----------------------------------------------------
    model = tracknet.Se3TrackNet(
        image_size=res, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    trainer = tr.Trainer(model, cfg, output_path, steps_per_epoch, mean, std)
    if args.resume:
        last = ck.latest_checkpoint(output_path)
        if last:
            print("Resuming from", last)
            trainer.resume(last)

    print("Training Begins:")
    trainer.loop(cfg.epochs, train_batches, val_batches)
    print("Training Complete")


if __name__ == "__main__":
    main()
