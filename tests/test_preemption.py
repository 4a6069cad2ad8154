"""Preemption safety: SIGTERM mid-training -> clean checkpoint -> resume.

TPU pods are routinely preempted; the trainer installs a SIGTERM handler that
finishes the in-flight step, writes an unconditional checkpoint (outside the
top-k metric ranking, train/checkpoint.py:save_preemption), and exits 0.
resume=true then continues from that exact step."""

import json
import os
import signal
import subprocess
import sys
import time


def test_sigterm_checkpoints_and_resumes(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "_preempt_worker.py")
    data_root = str(tmp_path / "data")
    out_root = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONUNBUFFERED"] = "1"
    cwd = os.path.dirname(os.path.dirname(worker))

    p = subprocess.Popen(
        [sys.executable, worker, data_root, out_root, "start"],
        env=env, cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # wait until at least one train step has logged, then preempt
    jsonl = os.path.join(out_root, "logs", "directory_exp1", "metrics.jsonl")
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(jsonl) and os.path.getsize(jsonl) > 0:
            break
        if p.poll() is not None:
            raise AssertionError(
                "worker died early:\n" + p.stdout.read().decode()[-2000:])
        time.sleep(0.5)
    else:
        p.kill()
        raise AssertionError("training never produced a logged step")
    p.send_signal(signal.SIGTERM)
    out = p.communicate(timeout=120)[0].decode()
    assert p.returncode == 0, out[-2000:]
    assert "will checkpoint and exit" in out
    assert "WORKER_DONE" in out

    ckpt_dir = os.path.join(out_root, "checkpoints", "directory_exp1")
    meta = os.path.join(ckpt_dir, "preempt_step.json")
    assert os.path.isdir(os.path.join(ckpt_dir, "preempt")), os.listdir(ckpt_dir)
    with open(meta) as f:
        pstep = json.load(f)["step"]
    assert pstep >= 1

    # resume for two more steps from the preemption checkpoint
    p2 = subprocess.run(
        [sys.executable, worker, data_root, out_root, "resume",
         str(pstep + 2)],
        env=env, cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=300,
    )
    out2 = p2.stdout.decode()
    assert p2.returncode == 0, out2[-2000:]
    assert f"resumed from checkpoint step {pstep}" in out2, out2[-2000:]
    assert "WORKER_DONE" in out2
