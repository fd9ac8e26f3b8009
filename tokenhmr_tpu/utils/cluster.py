"""Cluster submit-file generation for training jobs.

Capability of ref `tokenization/utils/cluster.py:30-82` (HTCondor
submit-file generator + `condor_submit_bid`, MPI-IS specific) and
`lib/configs_hydra/launcher/slurm.yaml` (submitit SLURM launcher),
re-targeted at TPU fleets:

* SLURM array jobs fan the grid out as `--cls-id $SLURM_ARRAY_TASK_ID`
  (the reference queues `num_exp` condor processes and passes
  `$(Process)` as `--cfg_id`),
* preemption is first-class: `--signal=TERM@<grace>` + `--requeue`
  drive the SIGTERM-checkpoint-requeue path already built into
  `cli/train.py` (the reference relies on submitit's
  `max_num_timeout: 3` resubmits),
* TPU resources are requested generically (`--gres`/custom flag) since
  SLURM TPU plugins differ per site; no GPU-model tables.

Nothing here shells out unless `submit=True` and `sbatch` exists — the
generator is usable (and tested) on machines without SLURM.
"""
from __future__ import annotations

import os
import shlex
import shutil
import stat
import subprocess
import sys
from typing import Optional, Sequence


def run_script(script: str, script_args: Sequence[str] = (),
               python: Optional[str] = None,
               task_flag: Optional[str] = "--cls-id") -> str:
    """The per-task runner: invokes `script` with the array index appended
    as `<task_flag> $TASK_ID` (ref cluster.py:72-73 passes `--cfg_id $1`).
    task_flag=None omits the index for scripts without a grid flag (e.g.
    cli/train_tokenizer.py); $TASK_ID is still exported for the script."""
    python = python or sys.executable
    args = " ".join(shlex.quote(a) for a in script_args)
    idx = f" {task_flag} $TASK_ID" if task_flag else ""
    return (
        "#!/bin/bash\n"
        "TASK_ID=${SLURM_ARRAY_TASK_ID:-${1:-0}}\n"
        "export TASK_ID\n"
        f"exec {shlex.quote(python)} {shlex.quote(script)} {args}{idx}\n"
    )


def slurm_submit_script(
    exp_name: str,
    runner_path: str,
    log_dir: str,
    num_exp: int = 1,
    num_workers: int = 8,
    memory_mb: int = 64000,
    time_limit: str = "7-00:00:00",
    partition: Optional[str] = None,
    tpu_gres: Optional[str] = None,
    grace_seconds: int = 120,
    exclude_nodes: str = "",
    requeue: bool = True,
) -> str:
    """An sbatch file: array over the grid, logs per task, SIGTERM
    `grace_seconds` before the limit so training checkpoints cleanly."""
    lines = [
        "#!/bin/bash",
        f"#SBATCH --job-name={exp_name}",
        f"#SBATCH --output={log_dir}/%A.%a.out",
        f"#SBATCH --error={log_dir}/%A.%a.err",
        f"#SBATCH --array=0-{num_exp - 1}",
        f"#SBATCH --cpus-per-task={int(num_workers)}",
        f"#SBATCH --mem={int(memory_mb)}M",
        f"#SBATCH --time={time_limit}",
        f"#SBATCH --signal=TERM@{int(grace_seconds)}",
    ]
    if requeue:
        lines.append("#SBATCH --requeue")
    if partition:
        lines.append(f"#SBATCH --partition={partition}")
    if tpu_gres:
        lines.append(f"#SBATCH --gres={tpu_gres}")
    if exclude_nodes:
        # comma- or whitespace-separated (node names commonly contain '-',
        # so the reference CLI's '-' separator would corrupt them)
        nodes = [n for n in exclude_nodes.replace(",", " ").split() if n]
        lines.append(f"#SBATCH --exclude={','.join(nodes)}")
    lines += ["", f"srun {shlex.quote(runner_path)}", ""]
    return "\n".join(lines)


def execute_task_on_cluster(
    script: str,
    exp_name: str,
    script_args: Sequence[str] = (),
    out_root: str = "cluster",
    num_exp: int = 1,
    num_workers: int = 8,
    memory_mb: int = 64000,
    submit: bool = False,
    task_flag: Optional[str] = "--cls-id",
    **slurm_kw,
) -> str:
    """Write `<out_root>/<exp_name>_{run.sh,submit.sbatch}` (+ log dir)
    and optionally `sbatch` the job (ref execute_task_on_cluster).
    Returns the submit-file path."""
    os.makedirs(out_root, exist_ok=True)
    log_dir = os.path.join(out_root, exp_name)
    os.makedirs(log_dir, exist_ok=True)

    runner_path = os.path.join(out_root, f"{exp_name}_run.sh")
    with open(runner_path, "w") as f:
        f.write(run_script(script, script_args, task_flag=task_flag))
    os.chmod(runner_path, os.stat(runner_path).st_mode | stat.S_IRWXU)

    submit_path = os.path.join(out_root, f"{exp_name}_submit.sbatch")
    with open(submit_path, "w") as f:
        f.write(slurm_submit_script(
            exp_name, runner_path, log_dir, num_exp=num_exp,
            num_workers=num_workers, memory_mb=memory_mb, **slurm_kw))

    print(f"wrote {submit_path}; logs under {log_dir}")
    if submit:
        if shutil.which("sbatch") is None:
            raise RuntimeError(
                "sbatch not found on PATH; run with submit=False and "
                "submit the generated file on the cluster head node")
        subprocess.check_call(["sbatch", submit_path])
    return submit_path
