"""core/tpu_opts: default-flag gating and env override parsing."""


from deadtrees_tpu.core import tpu_opts


def test_off_tpu_returns_none(monkeypatch):
    monkeypatch.delenv("DEADTREES_XLA_OPTS", raising=False)
    # tests force the CPU backend (conftest), so the TPU-only names are off
    assert tpu_opts.tpu_compiler_options() is None


def test_env_override_replaces_defaults(monkeypatch):
    monkeypatch.setenv(
        "DEADTREES_XLA_OPTS",
        "xla_tpu_scoped_vmem_limit_kib=32768,some_flag=true,ratio=1.5,s=x",
    )
    opts = tpu_opts.tpu_compiler_options()
    assert opts == {
        "xla_tpu_scoped_vmem_limit_kib": 32768,
        "some_flag": True,
        "ratio": 1.5,
        "s": "x",
    }


def test_env_empty_disables(monkeypatch):
    monkeypatch.setenv("DEADTREES_XLA_OPTS", "")
    assert tpu_opts.tpu_compiler_options() is None
