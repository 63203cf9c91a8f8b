"""MMLEARN_COMPILER_OPTIONS -> per-compile PJRT compiler options.

The XLA_FLAGS env var cannot carry TPU backend flags on tunneled
platforms (the client-side CPU XLA aborts on unknown flags at parse
time); ``compile_opts.step_jit`` forwards a JSON flag dict as
``jax.jit(compiler_options=...)`` instead, which the (possibly remote)
backend compiler validates. Used by the trainer's train/val steps and
bench.py. No reference counterpart (torch tunes via NCCL/cuBLAS env
vars); this is the XLA analogue.
"""

import json

import jax.numpy as jnp
import pytest

from mmlearn_tpu.compile_opts import compiler_options_from_env, step_jit


def test_no_env_returns_none(monkeypatch):
    monkeypatch.delenv("MMLEARN_COMPILER_OPTIONS", raising=False)
    assert compiler_options_from_env() is None


def test_parses_typed_values(monkeypatch):
    monkeypatch.setenv(
        "MMLEARN_COMPILER_OPTIONS",
        json.dumps({"xla_some_flag": False, "xla_other": 32768, "xla_s": "x"}),
    )
    opts = compiler_options_from_env()
    assert opts == {"xla_some_flag": False, "xla_other": 32768, "xla_s": "x"}
    # JSON types preserved: PJRT validates bools/ints as typed values
    assert opts["xla_some_flag"] is False and opts["xla_other"] == 32768


def test_non_dict_rejected(monkeypatch):
    monkeypatch.setenv("MMLEARN_COMPILER_OPTIONS", "[1, 2]")
    with pytest.raises(ValueError, match="JSON object"):
        compiler_options_from_env()


def test_step_jit_compiles_with_valid_backend_option(monkeypatch):
    # a real CPU-backend option: exercises the full jit(compiler_options=)
    # path on the test backend, not just the parser
    monkeypatch.setenv(
        "MMLEARN_COMPILER_OPTIONS",
        json.dumps({"xla_cpu_enable_fast_math": False}),
    )
    f = step_jit(lambda x: x * 2 + 1)
    assert float(f(jnp.ones((4,))).sum()) == 12.0


def test_step_jit_without_env_is_plain_jit(monkeypatch):
    monkeypatch.delenv("MMLEARN_COMPILER_OPTIONS", raising=False)
    f = step_jit(lambda x: x - 1, donate_argnums=(0,))
    assert float(f(jnp.ones((3,))).sum()) == 0.0
