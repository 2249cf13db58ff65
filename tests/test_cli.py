"""CLI surface tests: flag compatibility with the reference demo.py and a
1-epoch end-to-end run through main()."""

import pytest

from neighbour_feature_pooling_tpu.cli import _normalize_dataset, build_parser


def test_reference_flag_surface():
    # every reference flag must parse (demo.py:432-475)
    p = build_parser()
    args = p.parse_args([
        "--name", "exp", "--data_dir", "/tmp/x", "--max_epochs", "5",
        "--similarity", "cosine", "--dataset", "UCMerced",
        "--model_type", "resnet18", "--model_variant", "texture_nfp",
        "--batch_size", "16", "--resize_size", "256", "--input_size", "224",
        "--learning_rate", "1e-4", "--patience", "10",
        "--min_delta", "0.0001", "--nfp_radius", "1", "--nfp_padding", "0",
        "--nfp_stride", "1", "--nfp_layer_idx", "3", "--nfp_insert_idx", "1",
        "--nfp_intermediate_layer_idx", "1", "--nfp_mid_layer_idx", "1",
    ])
    assert args.model_variant == "texture_nfp"
    assert args.seeds == [42, 123, 999]  # reference 3-seed protocol


def test_all_reference_similarities_accepted():
    p = build_parser()
    for m in ["norm", "cosine", "dot", "rmse", "geman", "attention", "emd",
              "canberra", "hellinger", "chisquared1", "chisquared2", "gfc",
              "pearson", "jeffrey", "squaredchord", "smith",
              "sharpened_cosine", "scs"]:
        assert p.parse_args(["--similarity", m]).similarity == m


def test_dataset_normalization():
    # demo.py:479-489
    assert _normalize_dataset("ucmerced") == "UCMerced"
    assert _normalize_dataset("GTOS-Mobile") == "GTOS-Mobile"
    assert _normalize_dataset("gtos_mobile") == "GTOS-Mobile"
    assert _normalize_dataset("EuroSAT") == "EuroSAT"
    assert _normalize_dataset("PLANTVILLAGE") == "PlantVillage"


def test_model_type_aliases():
    p = build_parser()
    assert p.parse_args(["--model_type", "vit_tiny_patch16_224"]) is not None
    assert p.parse_args(["--model_type", "mobilenetv3_large_100"]) is not None


def test_invalid_variant_rejected():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["--model_variant", "bogus"])


def test_main_end_to_end_synthetic(tmp_path, monkeypatch, capsys):
    from neighbour_feature_pooling_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    main(["--dataset", "synthetic", "--model_type", "resnet18",
          "--model_variant", "gap_only", "--input_size", "24",
          "--batch_size", "16", "--max_epochs", "1", "--seeds", "7",
          "--learning_rate", "1e-3"])
    out = capsys.readouterr().out
    assert "Final Test Accuracy" in out
    assert (tmp_path / "logs" / "synthetic").exists()
    assert (tmp_path / "checkpoints" / "synthetic").exists()


def test_trainer_resume(tmp_path):
    from neighbour_feature_pooling_tpu.data import SyntheticDataModule
    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import Trainer, TrainerConfig

    dm = SyntheticDataModule(num_classes=2, num_samples=48, image_size=16,
                             batch_size=16)
    model = get_model("resnet18", "gap_only", 2)
    mk = lambda: Trainer(model, 2, TrainerConfig(  # noqa: E731
        learning_rate=1e-3, max_epochs=2, patience=10,
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
        freeze_nfp=False))
    t1 = mk()
    t1.fit(dm)
    # resume continues at epoch 2 and runs to max_epochs=4
    t2 = mk()
    t2.config.max_epochs = 4
    result = t2.fit(dm, resume=True)
    epochs = [h["epoch"] for h in result["history"]]
    assert epochs == [2, 3]
