"""Stage the BIOSCAN-CLIP reproduction: download, verify, smoke-test.

The published reference results (accuracy table in
/root/reference/projects/bioscan_clip/README.md:76-79, mirrored in
BASELINE.md) come from trimodal contrastive pretraining on BIOSCAN-1M.
This script makes the reproduction one command per stage so it can run the
moment the dataset file is present:

    # 1. download (needs network; ~30 GB) and set the env var
    python scripts/bioscan_stage.py download --dest /data/bioscan
    export BIOSCAN_1M_HDF5=/data/bioscan/BioScan_data_in_splits.hdf5

    # 2. verify the HDF5 has every split/column the loader reads
    python scripts/bioscan_stage.py verify --path "$BIOSCAN_1M_HDF5"

    # 3. end-to-end smoke of the EXACT experiment YAML on a synthetic
    #    HDF5 (tiny towers via overrides; no dataset needed)
    python scripts/bioscan_stage.py smoke

    # 4. the real run (projects/bioscan_clip/README.md maps its metrics
    #    to the published table)
    mmlearn_run 'searchpath=[projects/bioscan_clip/configs]' +experiment=bioscan_1m

Download URL from the reference README (reference
projects/bioscan_clip/README.md:25-38).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO_ROOT)

URLS = {
    "1m": (
        "https://aspis.cmpt.sfu.ca/projects/bioscan/clip_project/data/"
        "version_0.2.1/BioScan_data_in_splits.hdf5"
    ),
    "5m": (
        "https://aspis.cmpt.sfu.ca/projects/bioscan/"
        "BIOSCAN_CLIP_for_downloading/BIOSCAN_5M.hdf5"
    ),
}

#: every split the loader accepts (projects/bioscan_clip/dataset.py SPLITS)
#: and the columns each must carry for train + taxonomic eval. Both HDF5
#: variants ship the same split groups (reference dataset.py:26-40 types one
#: split set for both); the id column differs — 5M uses ``processid``, 1M
#: ``image_file`` (reference dataset.py:150-153)
_SPLIT_SET = (
    "no_split_and_seen_train", "all_keys", "val_seen", "val_unseen",
    "test_seen", "test_unseen",
)
REQUIRED_SPLITS = {"1m": _SPLIT_SET, "5m": _SPLIT_SET}
_COLUMN_SET = (
    "image", "image_mask", "barcode",
    "language_tokens_input_ids", "language_tokens_token_type_ids",
    "language_tokens_attention_mask",
)
REQUIRED_COLUMNS = {
    "1m": _COLUMN_SET + ("image_file",),
    "5m": _COLUMN_SET + ("processid",),
}
EVAL_COLUMNS = ("order", "family", "genus", "species")


def cmd_download(args: argparse.Namespace) -> int:
    os.makedirs(args.dest, exist_ok=True)
    url = URLS[args.variant]
    target = os.path.join(args.dest, os.path.basename(url))
    if os.path.exists(target) and not args.force:
        print(f"already present: {target} (use --force to re-download)")
        return 0
    print(f"downloading {url} -> {target}")
    rc = subprocess.call(["wget", "-c", "-O", target, url])
    if rc != 0:
        print("wget failed — download manually and run `verify`")
        return rc
    ns = argparse.Namespace(path=target, variant=args.variant)
    return cmd_verify(ns)


def cmd_verify(args: argparse.Namespace) -> int:
    import h5py

    problems = []
    with h5py.File(args.path, "r") as f:
        for split in REQUIRED_SPLITS[args.variant]:
            if split not in f:
                problems.append(f"missing split '{split}'")
                continue
            g = f[split]
            n = len(g["image"]) if "image" in g else 0
            for col in REQUIRED_COLUMNS[args.variant]:
                if col not in g:
                    problems.append(f"{split}: missing column '{col}'")
            if split != "no_split_and_seen_train":
                for col in EVAL_COLUMNS:
                    if col not in g:
                        problems.append(
                            f"{split}: missing taxonomy column '{col}' "
                            "(taxonomic eval will label rows 'unknown')"
                        )
            print(f"  {split}: {n} examples")
    if problems:
        print("VERIFY FAILED:")
        for p in problems:
            print("  -", p)
        return 1
    env = "BIOSCAN_1M_HDF5" if args.variant == "1m" else "BIOSCAN_5M_HDF5"
    print(f"verify OK — export {env} and run "
          "`mmlearn_run +experiment=bioscan_1m`")
    return 0


def make_synthetic_hdf5(path: str, n_per_split: int = 16, seed: int = 0) -> str:
    """Synthetic BIOSCAN-1M-shaped HDF5 with the REAL split names — the
    smoke fixture for running the exact experiment YAML end-to-end."""
    import io

    import h5py
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    orders = ["Diptera", "Hymenoptera", "Coleoptera"]
    with h5py.File(path, "w") as f:
        for split in REQUIRED_SPLITS["1m"]:
            g = f.create_group(split)
            enc, lengths = [], []
            for _ in range(n_per_split):
                arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                enc.append(np.frombuffer(buf.getvalue(), np.uint8))
                lengths.append(len(enc[-1]))
            padded = np.zeros((n_per_split, max(lengths)), np.uint8)
            for i, e in enumerate(enc):
                padded[i, : len(e)] = e
            g.create_dataset("image", data=padded)
            g.create_dataset("image_mask", data=np.asarray(lengths))
            g.create_dataset("barcode", data=np.asarray([
                "".join(rng.choice(list("ACGT"), 660)).encode()
                for _ in range(n_per_split)
            ]))
            g.create_dataset("image_file", data=np.asarray([
                f"{split}_{i}".encode() for i in range(n_per_split)
            ]))
            ids = rng.integers(2, 50, (n_per_split, 12)).astype(np.int32)
            g.create_dataset("language_tokens_input_ids", data=ids)
            g.create_dataset(
                "language_tokens_token_type_ids", data=np.zeros_like(ids)
            )
            g.create_dataset(
                "language_tokens_attention_mask", data=np.ones_like(ids)
            )
            for level in EVAL_COLUMNS:
                g.create_dataset(level, data=np.asarray([
                    rng.choice(orders).encode() for _ in range(n_per_split)
                ]))
    return path


#: overrides shrinking the bioscan_1m experiment to smoke scale — the
#: composition, loaders, task wiring, and eval path are the real ones
SMOKE_OVERRIDES = [
    "trainer.max_steps=2",
    "trainer.val_check_interval=2",
    "trainer.log_every_n_steps=1",
    "dataloader.train.batch_size=8",
    "dataloader.train.num_workers=0",
    "dataloader.val.batch_size=8",
    "task.encoders.rgb.img_size=64",
    "task.encoders.rgb.patch_size=16",
    "task.encoders.rgb.embed_dim=32",
    "task.encoders.rgb.depth=1",
    "task.encoders.rgb.num_heads=4",
    "task.encoders.rgb.proj_dim=16",
    "task.encoders.rgb.scan_blocks=false",
    "task.encoders.rgb.remat=false",
    "task.encoders.dna.embed_dim=32",
    "task.encoders.dna.depth=1",
    "task.encoders.dna.num_heads=4",
    "task.encoders.dna.projection_dim=16",
    "task.encoders.text.embed_dim=32",
    "task.encoders.text.depth=1",
    "task.encoders.text.num_heads=4",
    "task.encoders.text.max_length=16",
    "task.encoders.dna.max_length=256",
    "task.heads.text.out_dim=16",
    # qkv_num_heads must track the shrunken head counts (the fused-kernel
    # packing permutation the per-slice LoRA factors assemble through)
    "task.peft_configs.text.qkv_num_heads=4",
    "task.peft_configs.dna.qkv_num_heads=4",
    # '+' prefix: image_size is a dataset-constructor default the experiment
    # YAML omits, so it is a NEW key in the composed config (Hydra semantics)
    "+datasets.train.image_size=64",
    "+datasets.val.all_keys.image_size=64",
    "+datasets.val.val_seen.image_size=64",
    "+datasets.val.val_unseen.image_size=64",
]


def cmd_smoke(args: argparse.Namespace) -> int:
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bioscan_smoke_")
    h5 = make_synthetic_hdf5(os.path.join(tmp, "bioscan_smoke.hdf5"))
    env = dict(os.environ)
    env["BIOSCAN_1M_HDF5"] = h5
    env.setdefault("MMLEARN_PLATFORM", "cpu")
    argv = [
        sys.executable, "-m", "mmlearn_tpu.cli.run",
        "searchpath=[projects/bioscan_clip/configs]",
        "+experiment=bioscan_1m",
        f"runtime.output_dir={tmp}/out",
        *SMOKE_OVERRIDES,
        *(args.overrides or []),
    ]
    print("running:", " ".join(argv))
    return subprocess.call(argv, env=env, cwd=REPO_ROOT)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("download")
    d.add_argument("--dest", default="/data/bioscan")
    d.add_argument("--variant", choices=("1m", "5m"), default="1m")
    d.add_argument("--force", action="store_true")
    v = sub.add_parser("verify")
    v.add_argument("--path", required=True)
    v.add_argument("--variant", choices=("1m", "5m"), default="1m")
    s = sub.add_parser("smoke")
    s.add_argument("overrides", nargs="*")
    args = p.parse_args()
    return {
        "download": cmd_download, "verify": cmd_verify, "smoke": cmd_smoke
    }[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
