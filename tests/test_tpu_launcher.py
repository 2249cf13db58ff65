"""Shell-level tests for scripts/run_tpu_experiment.sh (the TPU-VM analog of
the reference SLURM launcher, /root/reference/run_nfp_experiments_new.slurm).

The worker half execs ``python demo.py ...`` — here a stub interpreter on
PATH records the argv so the tests exercise only the launcher's own logic
(name derivation, log-directory layout, stdout/stderr capture, exit codes)
without touching a backend.
"""

import os
import stat
import subprocess

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO_ROOT, "scripts", "run_tpu_experiment.sh")


def _make_stub_python(tmp_path, body='echo "ARGS: $@"\necho "E" >&2\nexit 0'):
    stub_dir = tmp_path / "bin"
    stub_dir.mkdir()
    stub = stub_dir / "python"
    stub.write_text("#!/bin/bash\n" + body + "\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return str(stub_dir)


def _run(args, tmp_path, stub_body=None, extra_env=None):
    env = dict(os.environ)
    kwargs = {"body": stub_body} if stub_body is not None else {}
    env["PATH"] = _make_stub_python(tmp_path, **kwargs) + os.pathsep + env["PATH"]
    env["NFP_TPU_LOG_DIR"] = str(tmp_path / "logs")
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        ["bash", LAUNCHER] + args,
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=60,
    )


def test_worker_derives_slurm_style_name_and_logs(tmp_path):
    r = _run(
        [
            "worker",
            "--dataset", "EuroSAT",
            "--model_type", "resnet18",
            "--model_variant", "texture_nfp",
        ],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    # Name derived like the SLURM file: ${variant}-${model}-${dataset}, lowered.
    assert "--name texture_nfp-resnet18-eurosat" in r.stdout
    log_dir = tmp_path / "logs" / "texture_nfp-resnet18-eurosat"
    outs = list(log_dir.glob("run_*.out"))
    errs = list(log_dir.glob("run_*.err"))
    assert len(outs) == 1 and len(errs) == 1
    assert "ARGS:" in outs[0].read_text()
    assert "E" in errs[0].read_text()


def test_worker_explicit_name_wins(tmp_path):
    r = _run(["worker", "--name", "myexp", "--dataset", "cifar10"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "logs" / "myexp").is_dir()
    # --name is forwarded once (the launcher's own), not duplicated.
    assert r.stdout.count("--name") == 1


def test_worker_propagates_training_failure(tmp_path):
    r = _run(["worker", "--dataset", "cifar10"], tmp_path, stub_body="exit 7")
    assert r.returncode == 7


def test_launch_requires_tpu_name(tmp_path):
    r = _run(["launch", "--dataset", "cifar10"], tmp_path)
    assert r.returncode != 0
    assert "TPU_NAME" in r.stderr


def test_bad_mode_rejected(tmp_path):
    r = _run(["frobnicate"], tmp_path)
    assert r.returncode == 2
    assert "unknown mode" in r.stderr


def test_usage_message_without_mode():
    r = subprocess.run(
        ["bash", LAUNCHER], cwd=REPO_ROOT, capture_output=True, text=True
    )
    assert r.returncode != 0
    assert "launch|worker" in r.stderr
