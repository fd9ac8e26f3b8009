"""Config tree printing (ref rich_utils.py) and artifact download/cache
helpers (ref download.py / fetch_demo_data.sh)."""
import dataclasses
import os

import numpy as np
import pytest

from tokenhmr_tpu.utils import artifacts as A
from tokenhmr_tpu.utils.configs import format_config_tree, print_config_tree


@dataclasses.dataclass(frozen=True)
class _Inner:
    depth: int = 2
    dtype: str = "bf16"


@dataclasses.dataclass(frozen=True)
class _Outer:
    name: str = "tiny"
    inner: _Inner = _Inner()


class TestConfigTree:
    def test_dataclass_tree(self):
        text = format_config_tree(_Outer())
        assert text.splitlines()[0] == "CONFIG"
        assert "├── name: 'tiny'" in text
        assert "└── inner" in text
        assert "depth: 2" in text and "dtype: 'bf16'" in text

    def test_nested_dict_and_namespace(self):
        import argparse
        ns = argparse.Namespace(lr=1e-4, steps=10)
        text = format_config_tree({"train": {"ns": ns}, "flag": True})
        assert "lr: 0.0001" in text and "flag: True" in text

    def test_print_and_save(self, tmp_path, capsys):
        out = str(tmp_path / "tree.txt")
        print_config_tree({"a": 1}, save_to_file=out)
        assert "a: 1" in capsys.readouterr().out
        assert "a: 1" in open(out).read()


class TestArtifacts:
    def test_cache_url_passthrough_for_local_paths(self, tmp_path):
        p = str(tmp_path / "weights.pkl")
        assert A.cache_url(p, str(tmp_path / "cache.pkl")) == p

    def test_cache_url_skips_existing(self, tmp_path):
        cached = tmp_path / "got.bin"
        cached.write_bytes(b"x")
        # URL is never touched because the cache file exists
        out = A.cache_url("https://invalid.example/file", str(cached))
        assert out == str(cached)

    def test_download_url_file_scheme(self, tmp_path):
        src = tmp_path / "src.bin"
        payload = np.random.RandomState(0).bytes(100_000)
        src.write_bytes(payload)
        dst = tmp_path / "dst.bin"
        n = A.download_url(src.as_uri(), str(dst), progress_hook=None)
        assert n == len(payload)
        assert dst.read_bytes() == payload
        assert not os.path.exists(str(dst) + ".part")

    def test_fetch_unknown_artifact(self):
        with pytest.raises(KeyError):
            A.fetch("nope", "https://x.example/f")

    def test_fetch_layout(self, tmp_path):
        src = tmp_path / "ckpt.bin"
        src.write_bytes(b"model")
        # non-URL passes through; known names map to the standard layout
        assert A.fetch("tokenizer_ckpt", str(src), str(tmp_path)) == str(src)
        assert A.ARTIFACT_PATHS["smpl_neutral"].endswith("SMPL_NEUTRAL.pkl")


class TestClusterSubmit:
    def test_generates_runner_and_sbatch(self, tmp_path):
        from tokenhmr_tpu.utils import cluster as C

        # cli/train.py defines --cls-id (the grid flag); hyphenated node
        # names must survive the exclude list
        sub = C.execute_task_on_cluster(
            "cli/train.py", "hmr_grid",
            script_args=["--synthetic-data"],
            out_root=str(tmp_path), num_exp=4, num_workers=6,
            memory_mb=32000, tpu_gres="tpu:v5e:8",
            exclude_nodes="gpu-node01,gpu-node02")
        text = open(sub).read()
        assert "#SBATCH --array=0-3" in text
        assert "#SBATCH --signal=TERM@120" in text
        assert "#SBATCH --requeue" in text
        assert "#SBATCH --gres=tpu:v5e:8" in text
        assert "#SBATCH --exclude=gpu-node01,gpu-node02" in text
        runner = open(str(tmp_path / "hmr_grid_run.sh")).read()
        assert "--cls-id $TASK_ID" in runner
        assert "--synthetic-data" in runner
        import os as _os
        assert _os.access(str(tmp_path / "hmr_grid_run.sh"), _os.X_OK)

    def test_no_task_flag_for_scripts_without_grid(self, tmp_path):
        """cli/train_tokenizer.py has no --cls-id: task_flag=None keeps the
        runner valid and still exports TASK_ID for the script."""
        from tokenhmr_tpu.utils import cluster as C

        C.execute_task_on_cluster(
            "cli/train_tokenizer.py", "vq", task_flag=None,
            script_args=["--quantizer", "ema_reset"], out_root=str(tmp_path))
        runner = open(str(tmp_path / "vq_run.sh")).read()
        assert "--cls-id" not in runner
        assert "export TASK_ID" in runner
        assert "--quantizer ema_reset" in runner

    def test_runner_executes_locally(self, tmp_path):
        """The generated runner is the local fallback too ($1 = task id)."""
        import subprocess as sp
        from tokenhmr_tpu.utils import cluster as C

        probe = tmp_path / "probe.py"
        probe.write_text(
            "import sys; print('ARGS', sys.argv[1:])")
        C.execute_task_on_cluster(
            str(probe), "probe", out_root=str(tmp_path), num_exp=2)
        out = sp.run([str(tmp_path / "probe_run.sh"), "1"],
                     capture_output=True, text=True, check=True).stdout
        assert "'--cls-id', '1'" in out

    def test_submit_without_sbatch_raises(self, tmp_path, monkeypatch):
        from tokenhmr_tpu.utils import cluster as C
        import shutil as _sh
        monkeypatch.setattr(_sh, "which", lambda _: None)
        with pytest.raises(RuntimeError):
            C.execute_task_on_cluster(
                "x.py", "e", out_root=str(tmp_path), submit=True)


class TestFetchCli:
    def test_list_and_fetch(self, tmp_path, capsys):
        from cli.fetch import main

        assert main(["--list"]) == 0
        assert "tokenhmr_ckpt" in capsys.readouterr().out
        src = tmp_path / "w.pkl"
        src.write_bytes(b"x")
        assert main(["--data-dir", str(tmp_path), f"smpl_neutral={src}"]) == 0
        assert main(["malformed"]) == 2
        assert main(["nope=https://x.example/y"]) == 1
