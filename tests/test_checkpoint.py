"""Full-state checkpoint round-trip and mid-training resume — a capability
the reference lacks entirely (SURVEY.md §5: only final-epoch state_dicts)."""

import jax
import numpy as np

from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.train.checkpoint import latest_step, restore_state, save_state
from gemm_gan_tpu.train.wgan import WGANGPEngine


def test_resume_is_exact(tmp_path, tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    data = {"genes": tiny_data["genes"]}
    loader = Batches(data, batch_size=8, seed=0)
    batch = next(iter(loader))

    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    state = eng.init_state(0, batch)
    state, _ = eng.step(state, batch)
    state, _ = eng.step(state, batch)
    ckpt = str(tmp_path / "ckpt")
    save_state(ckpt, jax.device_get(state))
    assert latest_step(ckpt) == 2

    # continue original
    cont, m_direct = eng.step(state, batch)

    # restore into a fresh engine and continue
    eng2 = WGANGPEngine(cfg, steps_per_epoch=2)
    template = jax.device_get(eng2.init_state(0, batch))
    restored = restore_state(ckpt, template)
    assert int(restored.step) == 2
    resumed, m_resumed = eng2.step(restored, batch)

    for k in m_direct:
        np.testing.assert_allclose(float(m_direct[k]), float(m_resumed[k]),
                                   rtol=1e-6, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        jax.device_get(cont.g_params), jax.device_get(resumed.g_params))
