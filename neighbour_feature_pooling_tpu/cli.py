"""Experiment CLI — flag-compatible with the reference ``demo.py``.

Mirrors the reference's L5 orchestration (``/root/reference/demo.py:431-557``):
argparse surface → name normalization → num_classes resolution → 3-seed loop
(42, 123, 999) → per-seed fit + best-checkpoint test → mean±std summary.

Additions over the reference: ``--dataset synthetic`` (offline smoke/bench
workload), ``--seeds``, ``--num_devices`` (data-parallel mesh), and the
``--similarity`` flag actually reaches the texture_nfp head (in the
reference it is consumed only by legacy variants, ``demo.py:253-259`` vs the
hard-coded cosine at ``NFP_Pooling.py:10-16``).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import numpy as np

from .data import DATASET_NUM_CLASSES, get_datamodule
from .models import MODEL_VARIANTS, canonical_model_type, get_model
from .ops.measures import MEASURE_NAMES
from .train import Trainer, TrainerConfig
from .train.checkpoint import checkpoint_exists

__all__ = ["build_parser", "run_experiment",
           "run_experiments_seed_parallel", "main"]

_SUMMARY_PRINTED = False  # demo.py:76

#: (resize_size, input_size) when the user does not pass the flags
DATASET_DEFAULT_SIZES = {
    "cifar10": (36, 32),        # DataModules.py:85-98
    "FashionMNIST": (36, 32),   # DataModules.py:24-40
    "EuroSAT": (64, 64),        # 64px tiles
    "MSTAR": (128, 128),
    "synthetic": (64, 64),
}
_FALLBACK_SIZES = (256, 224)    # demo.py:459-460


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train models with GAP/NFP variants on various datasets "
                    "(TPU-native)")
    # reference surface (demo.py:432-475)
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--max_epochs", type=int, default=200)
    p.add_argument("--similarity", type=str, default="cosine",
                   choices=MEASURE_NAMES + ["mahalanobis"])
    # no argparse choices: spellings like "eurosat"/"gtos_mobile" are
    # accepted and normalized (demo.py:479-489); unknown names fail in
    # get_datamodule with the registry list
    p.add_argument("--dataset", type=str, default="UCMerced",
                   help="UCMerced|RESISC45|MSTAR|cifar10|GTOS-Mobile|"
                        "PlantVillage|EuroSAT|FashionMNIST|"
                        "sugarcane_damage_usa|synthetic (case/sep insensitive)")
    p.add_argument("--model_type", type=str, default="resnet18",
                   choices=["resnet18", "resnet50", "vittiny", "mobilenetv3",
                            "vit_tiny_patch16_224", "mobilenetv3_large_100"])
    all_variants = sorted({v for vs in MODEL_VARIANTS.values() for v in vs})
    p.add_argument("--model_variant", type=str, default="gap_only",
                   choices=all_variants)
    p.add_argument("--batch_size", type=int, default=32)
    # None -> per-dataset default (DATASET_DEFAULT_SIZES); explicit wins.
    # The reference hard-codes 256/224 for every dataset (demo.py:459-460),
    # which silently upscales 32px CIFAR / 64px EuroSAT to 224.
    p.add_argument("--resize_size", type=int, default=None)
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--reference_sizes", action="store_true",
                   help="force the reference's 256/224 resize/input sizes "
                        "for EVERY dataset (demo.py:459-460) — one flag for "
                        "like-for-like accuracy comparisons against the "
                        "paper; explicit --resize_size/--input_size still "
                        "win")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--min_delta", type=float, default=0.0001)
    p.add_argument("--nfp_radius", type=int, default=1)
    p.add_argument("--nfp_padding", type=int, default=0)
    p.add_argument("--nfp_stride", type=int, default=1)
    p.add_argument("--nfp_layer_idx", type=int, default=3)
    p.add_argument("--nfp_insert_idx", type=int, default=1)
    p.add_argument("--nfp_intermediate_layer_idx", type=int, default=1)
    p.add_argument("--nfp_mid_layer_idx", type=int, default=1)
    # trainer features at reference-parity defaults (Lightning_Wrapper.py:35,
    # 69-79: label_smoothing=0.05, optional scheduler monitoring val_loss)
    p.add_argument("--scheduler", type=str, default="none",
                   choices=["none", "cosine", "plateau"])
    p.add_argument("--label_smoothing", type=float, default=0.05)
    # TPU-native additions
    p.add_argument("--num_samples", type=int, default=256,
                   help="synthetic dataset size (--dataset synthetic only)")
    p.add_argument("--pretrained", type=str, default=None,
                   help="path to a timm state_dict (.pth/.npz) ported into "
                        "the backbone (reference: timm pretrained=True, "
                        "texture_pooling.py:19)")
    p.add_argument("--import_ckpt", type=str, default=None,
                   help="warm-start from a TRAINED reference checkpoint "
                        "(Lightning .ckpt / torch state_dict): the full "
                        "model — backbone + head + classifier — is "
                        "converted via models.import_torch and fine-tuned "
                        "from there (migration path; excludes --pretrained)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay fp32)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks in the backward pass "
                        "(more FLOPs, less HBM; enables larger batches)")
    p.add_argument("--stem_s2d", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="ResNet stems: compute the 7x7/s2 conv via "
                        "space-to-depth — numerically equivalent, measured "
                        "faster on TPU (--no-stem_s2d disables)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of the first N train "
                        "steps into {log_dir}/profile")
    p.add_argument("--device_augment", action="store_true",
                   help="run TRAIN-batch crop/resize/flip/normalize on the "
                        "accelerator (host only plans crops); removes the "
                        "CPU input-pipeline ceiling on few-core hosts. Eval "
                        "batches keep the host pipeline (exact parity)")
    p.add_argument("--device_data", action="store_true",
                   help="keep the decoded TRAIN split resident on the "
                        "accelerator (uploaded once as uint8) and gather + "
                        "augment rows on device each step; the host sends "
                        "only indices and crop plans. Needs uniform image "
                        "shapes and the split under NFP_TPU_DEVICE_DATA_MB "
                        "(default 4096) of HBM; falls back to streaming "
                        "otherwise")
    p.add_argument("--device_eval", action="store_true",
                   help="ALSO run eval batches from the device-resident "
                        "split: antialiased Resize+CenterCrop as two MXU "
                        "matmuls (PIL-exact filter weights, ~1e-6 vs the "
                        "host oracle). Default off: eval stays bit-exact "
                        "vs the reference pipeline")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps per host dispatch (lax.scan); >1 "
                        "amortizes dispatch overhead (~10%% through the TPU "
                        "relay at flagship shapes)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate this many micro-batch gradients per "
                        "optimizer update (optax.MultiSteps): an effective "
                        "batch grad_accum x larger in the same per-step "
                        "HBM")
    p.add_argument("--seeds", type=int, nargs="+", default=[42, 123, 999])
    p.add_argument("--seed_parallel", action="store_true",
                   help="train ALL seeds simultaneously as one vmapped + "
                        "mesh-sharded program (Mesh(('seed','data'))) — the "
                        "3-seed protocol at ~one training's wall-clock. "
                        "Same per-seed rngs/shuffles/early-stopping as the "
                        "serial loop; unsupported with --scheduler plateau "
                        "or --steps_per_dispatch > 1")
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="model-axis size of a 2-D (data, model) mesh: wide "
                        "parameters (classifier fc, DeepTEN codebook+BN, "
                        "ViT MLPs) and their Adam moments shard over this "
                        "axis (parallel.tp.MODEL_AXIS_RULES); must divide "
                        "the device count")
    p.add_argument("--zero", choices=["none", "zero1", "fsdp"],
                   default="none",
                   help="ZeRO sharding over the data axis (parallel/"
                        "zero.py): zero1 shards the Adam moments, fsdp "
                        "also shards the parameters; per-chip optimizer "
                        "(and under fsdp, weight) memory drops by the "
                        "data-axis size. Composes with --model_parallel")
    p.add_argument("--pipeline", type=int, default=1,
                   help="pipeline-parallel stages for the ViT encoder "
                        "(GPipe, parallel/pp.py) on a (data, pipe) mesh; "
                        "must divide the device count and the ViT depth "
                        "(12). vittiny only BY DESIGN (conv stages are "
                        "heterogeneous — use --num_devices/--zero/"
                        "--model_parallel there; docs/API.md 'Design "
                        "boundary'). Gives the GPipe schedule with "
                        "replicated weights; per-chip weight-memory "
                        "savings need the library path "
                        "(pp.shard_stacked_params). Incompatible with "
                        "--model_parallel/--zero/--seed_parallel")
    p.add_argument("--pp_microbatches", type=int, default=8,
                   help="GPipe microbatches per step under --pipeline; "
                        "must divide the global batch (pipeline bubble = "
                        "(P-1)/(M+P-1), so pick M >= ~4 stages)")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--async_ckpt", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="overlap best/last checkpoint writes with the next "
                        "epoch (orbax background commit; "
                        "TrainerConfig.async_ckpt). --no-async_ckpt makes "
                        "every save block until durable")
    p.add_argument("--resume", action="store_true",
                   help="restore each seed's `last` checkpoint before "
                        "training (continues an interrupted/preempted run "
                        "exactly; no-op when no checkpoint exists)")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: restore a checkpoint per seed and "
                        "run the test protocol (metrics, confusion-matrix "
                        "PNG, metrics.jsonl). Weights come from "
                        "--eval_restore, or from --import_ckpt / "
                        "--pretrained when given with --eval_restore none")
    p.add_argument("--eval_restore", choices=["best", "last", "none"],
                   default="best",
                   help="which checkpoint --eval_only restores from this "
                        "run's checkpoint dir; `none` evaluates the "
                        "constructed weights (e.g. an imported reference "
                        "checkpoint) as-is")
    p.add_argument("--export_dir", default=None,
                   help="after training, freeze the best seed's best "
                        "checkpoint into a jax.export serving artifact "
                        "here (serve.export_predictor; reload with "
                        "serve.load_exported — no model code needed)")
    p.add_argument("--export_quantize",
                   choices=["none", "int8", "int8_mixed"], default="none",
                   help="export tier: int8 = full PTQ (calibrated on val "
                        "images), int8_mixed = dense/1×1 int8 + spatial "
                        "convs bf16 (fastest measured ResNet50 tier)")
    p.add_argument("--export_batch_size", type=int, default=32)
    return p


def _normalize_dataset(name: str) -> str:
    key = name.strip().replace("-", "").replace("_", "").lower()
    mapping = {  # demo.py:479-489
        "ucmerced": "UCMerced", "resisc45": "RESISC45", "mstar": "MSTAR",
        "cifar10": "cifar10", "gtosmobile": "GTOS-Mobile",
        "plantvillage": "PlantVillage", "eurosat": "EuroSAT",
        "fashionmnist": "FashionMNIST", "synthetic": "synthetic",
        "sugarcanedamageusa": "sugarcane_damage_usa",
    }
    return mapping.get(key, name)


def _model_kwargs(config: Dict) -> Dict:
    """The ``get_model`` kwargs implied by a CLI config — shared by the
    training path and artifact export so the Predictor rebuilds the
    exact trained module (same param tree)."""
    import jax.numpy as jnp

    return dict(
        measure=config.get("similarity", "cosine"),
        nfp_radius=config.get("nfp_radius", 1),
        nfp_padding=config.get("nfp_padding", 0),
        nfp_stride=config.get("nfp_stride", 1),
        nfp_layer_idx=config.get("nfp_layer_idx", 3),
        nfp_insert_idx=config.get("nfp_insert_idx", 1),
        nfp_intermediate_layer_idx=config.get("nfp_intermediate_layer_idx",
                                              1),
        nfp_mid_layer_idx=config.get("nfp_mid_layer_idx", 1),
        dtype=jnp.bfloat16 if config.get("bf16") else jnp.float32,
        remat=config.get("remat", False),
        stem_s2d=config.get("stem_s2d", True),
    )


def run_experiment(seed: int, config: Dict,
                   info: Optional[Dict] = None) -> float:
    """One seed: data → model → fit → best-checkpoint test → test accuracy
    (``demo.py:217-428``). ``info``, when given, is filled with the
    resolved model geometry + checkpoint dir + datamodule — what
    :func:`_export_artifact` needs to freeze the trained model."""
    import jax
    import jax.numpy as jnp

    dataset = config["dataset"]
    # per-run seed drives shuffling/augmentation; the split stays fixed
    # (datamodules' split_seed) so all seeds share one test set
    config = dict(config, seed=seed)
    data_module = get_datamodule(dataset, config)
    # Force 13 channels for multispectral EuroSAT (demo.py:224-229)
    num_input_channels = 13 if dataset.lower() == "eurosat" else 3
    data_module.num_input_channels = num_input_channels

    exp_dir = os.path.join(
        "logs", dataset,
        f"{config['model_type']}-{config['model_variant']}-seed{seed}")
    ckpt_dir = os.path.join("checkpoints", dataset,
                            f"{config['name']}_seed{seed}")

    data_module.prepare_data()
    data_module.setup("test" if config.get("eval_only") else "fit")
    if (hasattr(data_module, "print_first_batch_shape")
            and not config.get("eval_only")):
        data_module.print_first_batch_shape()
    num_classes = getattr(data_module, "num_classes", None) or \
        config["num_classes"]

    model = get_model(
        config["model_type"], config["model_variant"], num_classes,
        num_input_channels=num_input_channels,
        **_model_kwargs(config),
    )
    if info is not None:
        info.update(num_classes=num_classes,
                    num_input_channels=num_input_channels,
                    ckpt_dir=ckpt_dir, datamodule=data_module)

    mesh = None
    n_dev = config.get("num_devices")
    if n_dev is None:
        n_dev = len(jax.devices())
    mp = int(config.get("model_parallel", 1) or 1)
    pp = int(config.get("pipeline", 1) or 1)
    if pp > 1:
        if mp > 1:
            raise SystemExit("--pipeline and --model_parallel do not "
                             "compose yet; pick one")
        from .models.zoo import canonical_model_type
        if canonical_model_type(config["model_type"]) != "vittiny":
            raise SystemExit(
                "--pipeline stages the ViT encoder's homogeneous blocks; "
                "it requires --model_type vittiny (ResNet/MobileNet "
                "stages are heterogeneous — use --model_parallel/--zero)")
        from .parallel import create_pp_mesh

        mesh = create_pp_mesh(pp, jax.devices()[:n_dev])
    elif mp > 1:
        from .parallel import create_tp_mesh

        mesh = create_tp_mesh(mp, jax.devices()[:n_dev])
    elif n_dev > 1:
        from .parallel import create_mesh

        mesh = create_mesh(jax.devices()[:n_dev])

    # one-time model summary (torchinfo.summary parity, demo.py:354-363);
    # skipped on --eval_only: its sample fetch + model.init is an extra
    # remote compile on a path advertised as "skip training"
    global _SUMMARY_PRINTED
    if not _SUMMARY_PRINTED and not config.get("eval_only"):
        import jax

        from .utils import summarize

        sample = next(iter(data_module.train_batches(0)))
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               sample["image"][:1], train=False)
        print(summarize(variables))
        _SUMMARY_PRINTED = True

    if config.get("pretrained") and config.get("import_ckpt"):
        raise SystemExit("--import_ckpt already contains a trained "
                         "backbone; drop --pretrained")
    pretrained_backbone = None
    if config.get("pretrained"):
        from .models.backbones.timm_port import (load_torch_state_dict,
                                                 port_backbone)

        sd = load_torch_state_dict(config["pretrained"])
        pretrained_backbone = port_backbone(config["model_type"], sd,
                                            in_chans=num_input_channels)
        print(f"loaded pretrained backbone from {config['pretrained']}")

    init_variables = None
    if config.get("import_ckpt"):
        from .models.import_torch import import_reference_checkpoint

        init_variables, report = import_reference_checkpoint(
            config["import_ckpt"], config["model_type"],
            config["model_variant"], in_chans=num_input_channels)
        print(f"imported reference checkpoint {config['import_ckpt']} "
              f"({report['backbone_keys']} backbone tensors, "
              f"{len(report['consumed'])} head tensors)")

    trainer = Trainer(model, num_classes, TrainerConfig(
        learning_rate=config["learning_rate"],
        max_epochs=config["max_epochs"],
        patience=config["patience"],
        min_delta=config["min_delta"],
        label_smoothing=config.get("label_smoothing", 0.05),
        scheduler=config.get("scheduler", "none"),
        profile_steps=config.get("profile_steps", 0),
        steps_per_dispatch=config.get("steps_per_dispatch", 1),
        grad_accum=config.get("grad_accum", 1),
        async_ckpt=bool(config.get("async_ckpt", True)),
        freeze_nfp=True, unfreeze_epoch=5,  # demo.py:376-377
        log_dir=exp_dir, ckpt_dir=ckpt_dir, seed=seed,
    ), mesh=mesh, pretrained_backbone=pretrained_backbone,
        zero=config.get("zero", "none") or "none",
        init_variables=init_variables,
        pp_microbatches=(config.get("pp_microbatches", 8)
                         if pp > 1 else 0))
    try:
        if config.get("eval_only"):
            restore = config.get("eval_restore", "best")
            if restore != "none" and not checkpoint_exists(
                    os.path.join(ckpt_dir, restore)):
                raise SystemExit(
                    f"--eval_only: no `{restore}` checkpoint under "
                    f"{ckpt_dir} (train first, or point --import_ckpt at "
                    f"a reference checkpoint with --eval_restore none)")
            if (restore == "none" and not config.get("import_ckpt")
                    and not config.get("pretrained")):
                print("--eval_only --eval_restore none without "
                      "--import_ckpt/--pretrained: scoring FRESHLY "
                      "INITIALIZED weights")
            metrics = trainer.test(
                data_module,
                restore=None if restore == "none" else restore,
                label_names=getattr(data_module, "class_names",
                                    None) or None)
            return metrics["accuracy"]
        fit_result = trainer.fit(data_module,
                                 resume=bool(config.get("resume")))
        if fit_result.get("preempted"):
            # resumable checkpoint is on disk; skip test and signal the
            # seed loop to stop (re-run the same command with --resume to
            # continue — or rely on the scheduler restarting it)
            print(f"seed {seed}: preempted; resume with the same command "
                  f"+ --resume")
            return None
        metrics = trainer.test(data_module, restore="best",
                               label_names=getattr(data_module,
                                                   "class_names",
                                                   None) or None)
    finally:
        trainer.close()
    return metrics["accuracy"]


def run_experiments_seed_parallel(seeds: List[int],
                                  config: Dict) -> List[float]:
    """All seeds as one lockstep sharded program
    (``parallel/seed_parallel.py``); returns per-seed test accuracies in
    ``seeds`` order."""
    import jax
    import jax.numpy as jnp

    from .parallel.seed_parallel import SeedParallelRunner, seed_parallel_mesh

    dataset = config["dataset"]
    datamodules = []
    for seed in seeds:
        dm = get_datamodule(dataset, dict(config, seed=seed))
        dm.num_input_channels = 13 if dataset.lower() == "eurosat" else 3
        datamodules.append(dm)
    num_input_channels = datamodules[0].num_input_channels
    datamodules[0].prepare_data()
    datamodules[0].setup("fit")
    num_classes = getattr(datamodules[0], "num_classes", None) or \
        config["num_classes"]

    model = get_model(
        config["model_type"], config["model_variant"], num_classes,
        num_input_channels=num_input_channels,
        measure=config.get("similarity", "cosine"),
        nfp_radius=config.get("nfp_radius", 1),
        nfp_padding=config.get("nfp_padding", 0),
        nfp_stride=config.get("nfp_stride", 1),
        nfp_layer_idx=config.get("nfp_layer_idx", 3),
        nfp_insert_idx=config.get("nfp_insert_idx", 1),
        nfp_intermediate_layer_idx=config.get("nfp_intermediate_layer_idx",
                                              1),
        nfp_mid_layer_idx=config.get("nfp_mid_layer_idx", 1),
        dtype=jnp.bfloat16 if config.get("bf16") else jnp.float32,
        remat=config.get("remat", False),
        stem_s2d=config.get("stem_s2d", True),
    )

    n_dev = config.get("num_devices") or len(jax.devices())
    mesh = seed_parallel_mesh(len(seeds), jax.devices()[:n_dev])

    pretrained_backbone = None
    if config.get("pretrained"):
        from .models.backbones.timm_port import (load_torch_state_dict,
                                                 port_backbone)

        sd = load_torch_state_dict(config["pretrained"])
        pretrained_backbone = port_backbone(config["model_type"], sd,
                                            in_chans=num_input_channels)

    init_variables = None
    if config.get("import_ckpt"):
        if config.get("pretrained"):
            raise SystemExit("--import_ckpt already contains a trained "
                             "backbone; drop --pretrained")
        from .models.import_torch import import_reference_checkpoint

        init_variables, _ = import_reference_checkpoint(
            config["import_ckpt"], config["model_type"],
            config["model_variant"], in_chans=num_input_channels)

    exp_dir = os.path.join(
        "logs", dataset,
        f"{config['model_type']}-{config['model_variant']}-seedpar")
    ckpt_dir = os.path.join("checkpoints", dataset,
                            f"{config['name']}_seedpar")
    from .train import TrainerConfig

    runner = SeedParallelRunner(model, num_classes, seeds, TrainerConfig(
        learning_rate=config["learning_rate"],
        max_epochs=config["max_epochs"],
        patience=config["patience"],
        min_delta=config["min_delta"],
        label_smoothing=config.get("label_smoothing", 0.05),
        scheduler=config.get("scheduler", "none"),
        freeze_nfp=True, unfreeze_epoch=5,
        log_dir=exp_dir, ckpt_dir=ckpt_dir,
    ), mesh=mesh, pretrained_backbone=pretrained_backbone,
        init_variables=init_variables)
    runner.fit(datamodules)
    metrics = runner.test(datamodules)
    return [m["accuracy"] for m in metrics]


def _export_artifact(info: Dict, config: Dict, args) -> None:
    """Train→serve handoff: freeze the best seed's best checkpoint into a
    ``jax.export`` artifact (optionally quantized + calibrated on val
    images). The reference has no deployment path at all
    (``/root/reference/demo.py:427`` stops at ``trainer.test``)."""
    import jax.numpy as jnp
    import numpy as np

    from .serve import Predictor, export_predictor

    mixed = args.export_quantize == "int8_mixed"
    quantize = None if args.export_quantize == "none" else "int8"
    mk = _model_kwargs(config)
    if mixed:
        mk["dtype"] = jnp.bfloat16
    pred = Predictor(
        config["model_type"], config["model_variant"],
        info["num_classes"],
        checkpoint=os.path.join(info["ckpt_dir"], "best"),
        batch_size=args.export_batch_size,
        input_size=config["input_size"],
        resize_size=config["resize_size"],
        num_input_channels=info["num_input_channels"],
        model_kwargs=mk, quantize=quantize,
        quantize_spatial=not mixed)
    if quantize:
        # calibrate on (already-normalized) val images
        imgs = []
        for batch in info["datamodule"].val_batches():
            x = np.asarray(batch["image"], np.float32)
            w = np.asarray(batch["weight"]) > 0
            imgs.extend(list(x[w]))
            if len(imgs) >= 64:
                break
        if imgs:
            n = pred.calibrate(imgs[:64], preprocessed=True)
            print(f"export: calibrated {n} layers on {len(imgs[:64])} "
                  f"val images")
    export_predictor(pred, args.export_dir)
    print(f"export: serving artifact written to {args.export_dir} "
          f"(tier={args.export_quantize})")


def main(argv: Optional[List[str]] = None) -> None:
    from .parallel import initialize_distributed
    from .utils import enable_compilation_cache

    try:
        # `kill -USR1 <pid>` dumps every thread's Python stack to stderr —
        # the only stack visibility in this container (no gdb/py-spy) when
        # a run wedges (e.g. the async-checkpoint relay deadlock found in
        # the round-3 soak)
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (ImportError, AttributeError, ValueError):
        pass  # non-posix or nested-interpreter environments

    # multi-host entry: no-op unless JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES
    # request a multi-process launch (one process per TPU host)
    initialize_distributed()
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    args.dataset = _normalize_dataset(args.dataset)
    args.model_type = canonical_model_type(args.model_type)
    args.model_variant = args.model_variant.lower()

    num_classes = DATASET_NUM_CLASSES.get(args.dataset, 10)  # demo.py:494-503

    # --reference_sizes: the reference resizes every dataset to 256/224
    # (demo.py:459-460); our per-dataset defaults are saner but silently
    # change like-for-like accuracy comparisons — this flag restores the
    # reference sizing in one switch (explicit flags still win)
    default_sizes = (_FALLBACK_SIZES if args.reference_sizes
                     else DATASET_DEFAULT_SIZES.get(args.dataset,
                                                    _FALLBACK_SIZES))
    if args.resize_size is None:
        args.resize_size = default_sizes[0]
    if args.input_size is None:
        args.input_size = default_sizes[1]

    config = {
        "name": args.name,
        "data_dir": args.data_dir,
        "batch_size": {"train": args.batch_size, "val": args.batch_size,
                       "test": args.batch_size},
        "num_workers": args.num_workers,
        "learning_rate": args.learning_rate,
        "max_epochs": args.max_epochs,
        "resize_size": args.resize_size,
        "input_size": args.input_size,
        "num_classes": num_classes,
        "patience": args.patience,
        "min_delta": args.min_delta,
        "similarity": args.similarity,
        "dataset": args.dataset,
        "model_type": args.model_type,
        "model_variant": args.model_variant,
        "nfp_radius": args.nfp_radius,
        "nfp_padding": args.nfp_padding,
        "nfp_stride": args.nfp_stride,
        "nfp_layer_idx": args.nfp_layer_idx,
        "nfp_insert_idx": args.nfp_insert_idx,
        "nfp_intermediate_layer_idx": args.nfp_intermediate_layer_idx,
        "nfp_mid_layer_idx": args.nfp_mid_layer_idx,
        "num_devices": args.num_devices,
        "model_parallel": args.model_parallel,
        "zero": args.zero,
        "pipeline": args.pipeline,
        "pp_microbatches": args.pp_microbatches,
        "async_ckpt": args.async_ckpt,
        "resume": args.resume,
        "bf16": args.bf16,
        "scheduler": args.scheduler,
        "label_smoothing": args.label_smoothing,
        "num_samples": args.num_samples,
        "pretrained": args.pretrained,
        "import_ckpt": args.import_ckpt,
        "remat": args.remat,
        "stem_s2d": args.stem_s2d,
        "profile_steps": args.profile_steps,
        "steps_per_dispatch": args.steps_per_dispatch,
        "grad_accum": args.grad_accum,
        "device_augment": args.device_augment,
        "device_data": args.device_data,
        "device_eval": args.device_eval,
        "eval_only": args.eval_only,
        "eval_restore": args.eval_restore,
    }

    seed_parallel = args.seed_parallel
    if args.eval_only and seed_parallel:
        print("--eval_only restores per-seed checkpoints from the serial "
              "loop; falling back from --seed_parallel")
        seed_parallel = False
    if args.eval_only and args.export_dir:
        raise SystemExit("--eval_only does not train; use "
                         "scripts/export_model.py to export an existing "
                         "checkpoint")
    if (args.eval_only and args.eval_restore != "none"
            and (args.import_ckpt or args.pretrained)):
        # restoring a local checkpoint would silently overwrite the
        # imported/pretrained weights the user asked to score
        raise SystemExit(
            f"--eval_only --eval_restore {args.eval_restore} would "
            f"overwrite the --import_ckpt/--pretrained weights with the "
            f"local `{args.eval_restore}` checkpoint; pass "
            f"--eval_restore none to score the imported weights as-is")
    if seed_parallel and args.zero != "none":
        print("--seed_parallel builds its own (seed, data) mesh; "
              "--zero is ignored with it — falling back to the serial "
              "seed loop")
        seed_parallel = False
    if seed_parallel and args.model_parallel > 1:
        print("--seed_parallel builds its own (seed, data) mesh; "
              "--model_parallel is ignored with it — falling back to the "
              "serial seed loop")
        seed_parallel = False
    if seed_parallel and args.pipeline > 1:
        print("--seed_parallel builds its own (seed, data) mesh; "
              "--pipeline is ignored with it — falling back to the "
              "serial seed loop")
        seed_parallel = False
    if seed_parallel and (args.scheduler == "plateau"
                          or args.steps_per_dispatch > 1
                          or args.grad_accum > 1):
        print("--seed_parallel does not support --scheduler plateau, "
              "--steps_per_dispatch > 1 or --grad_accum > 1; falling "
              "back to the serial seed loop")
        seed_parallel = False
    if seed_parallel and args.resume:
        print("--resume restores per-seed checkpoints from the serial "
              "loop; falling back from --seed_parallel")
        seed_parallel = False
    if seed_parallel and args.export_dir:
        print("--export_dir uses the serial seed loop's checkpoints; "
              "falling back from --seed_parallel")
        seed_parallel = False
    if seed_parallel:
        print(f"\n==== Running {len(args.seeds)} seeds in parallel "
              f"(lockstep sharded program) ====")
        results = run_experiments_seed_parallel(args.seeds, config)
        for seed, acc in zip(args.seeds, results):
            print(f"Seed {seed} Test Accuracy: {acc:.4f}")
    else:
        results = []
        infos = []
        for seed in args.seeds:  # demo.py:545-551
            print(f"\n==== Running experiment with seed {seed} ====")
            info: Dict = {}
            acc = run_experiment(seed, config, info=info)
            if acc is None:  # preempted; resumable checkpoint on disk
                print(f"Seed {seed} preempted — stopping the seed loop")
                break
            print(f"Seed {seed} Test Accuracy: {acc:.4f}")
            results.append(acc)
            infos.append(info)
        if args.export_dir and results:
            _export_artifact(infos[int(np.argmax(results))], config, args)
    if not results:
        return
    print(f"\n Final Test Accuracy over {len(results)} seeds: "
          f"{np.mean(results):.4f} ± {np.std(results):.4f}")


if __name__ == "__main__":
    main()
