"""cfg.dtype validation + non-float32 execution path.

The gather-free resampling apply is an int32-bitcast trick and is
float32-only; other dtypes must either run via the equivalent gather path
(float64 with x64 enabled) or fail AT CONSTRUCTION with a clear message —
never mid-run inside _resample (round-3 verdict, weak #4).
"""
import subprocess
import sys
import textwrap

import jax.numpy as jnp
import pytest

from smc_tpu import SMCConfig


def test_non_float_dtype_rejected():
    with pytest.raises(ValueError, match="floating"):
        SMCConfig(n_particles=64, dtype=jnp.int32)


def test_float64_without_x64_rejected():
    # suite runs with jax_enable_x64 off: must fail at construction, not
    # as a mid-run TypeError in residual_systematic_apply
    with pytest.raises(ValueError, match="jax_enable_x64"):
        SMCConfig(n_particles=64, dtype=jnp.float64)


def test_float64_run_end_to_end():
    """With x64 enabled, a float64 config runs to gamma=1 through the
    gather resampling fallback (subprocess: x64 is process-global and must
    not leak into the rest of the suite)."""
    code = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        from smc_tpu import SMCConfig, run_smc
        from smc_tpu.models.synthetic import BananaModel
        cfg = SMCConfig(n_particles=128, dtype=jnp.float64)
        st = run_smc(BananaModel(), cfg, jax.random.key(0), verbose=False)
        assert st.particles.dtype == jnp.float64, st.particles.dtype
        assert float(st.gamma) == 1.0, float(st.gamma)
        print("F64_OK")
    """)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "F64_OK" in out.stdout
