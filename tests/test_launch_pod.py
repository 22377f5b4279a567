"""Pod launcher dry-run (VERDICT r3 item 8): the exact per-worker
commands and jax.distributed env the launcher would execute, asserted
without touching gcloud/ssh.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "launch_pod", REPO / "scripts" / "launch_pod.py"
)
launch_pod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(launch_pod)


def test_build_gcloud_command():
    cmd = launch_pod.build_gcloud_command(
        "my-pod", "us-central2-b", "python run.py model=default"
    )
    assert cmd[:6] == ["gcloud", "compute", "tpus", "tpu-vm", "ssh", "my-pod"]
    assert "--zone=us-central2-b" in cmd
    assert "--worker=all" in cmd
    assert cmd[-1] == "--command=python run.py model=default"

    # zone optional
    cmd = launch_pod.build_gcloud_command("p", None, "x")
    assert not any(c.startswith("--zone") for c in cmd)


def test_build_ssh_commands_env_per_rank():
    launches = launch_pod.build_ssh_commands(
        ["h1", "h2", "h3"], "h1:8476", "python run.py"
    )
    assert [h for h, _ in launches] == ["h1", "h2", "h3"]
    for rank, (host, line) in enumerate(launches):
        assert line[0] == "ssh" and line[1] == host
        remote = line[2]
        assert "JAX_COORDINATOR_ADDRESS=h1:8476" in remote
        assert "JAX_NUM_PROCESSES=3" in remote
        assert f"JAX_PROCESS_ID={rank}" in remote
        assert remote.endswith("python run.py")


def test_print_mode_hosts(capsys):
    rc = launch_pod.main([
        "--hosts", "a", "b", "--print", "--",
        "python", "run.py", "model=default",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("ssh a ")
    assert "JAX_PROCESS_ID=0" in lines[0]
    assert "JAX_PROCESS_ID=1" in lines[1]
    # default coordinator = first host:8476
    assert "JAX_COORDINATOR_ADDRESS=a:8476" in lines[1]
    assert "model=default" in lines[1]


def test_print_mode_gcloud(capsys):
    rc = launch_pod.main([
        "--tpu", "pod-16", "--zone", "europe-west4-a", "--print", "--",
        "python", "run.py",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "gcloud compute tpus tpu-vm ssh pod-16" in out
    assert "--zone=europe-west4-a" in out
    assert "--worker=all" in out


def test_print_mode_cli_subprocess():
    """The whole CLI path through a real subprocess (no mocking)."""
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "launch_pod.py"),
         "--hosts", "h1", "h2", "--coordinator", "c:9000", "--print",
         "--", "python", "run.py", "trainer.devices=4"],
        capture_output=True, text=True, check=True,
    )
    lines = res.stdout.strip().splitlines()
    assert len(lines) == 2
    assert all("JAX_COORDINATOR_ADDRESS=c:9000" in ln for ln in lines)
    assert all("trainer.devices=4" in ln for ln in lines)


def test_no_command_errors():
    with pytest.raises(SystemExit):
        launch_pod.main(["--hosts", "h1", "--print"])
