"""IC/snapshot/params round trips and edge cases (components C19-C21)."""

import numpy as np
import pytest

from summersph_tpu.config import (SimConfig, read_parameters_txt,
                                  write_parameters_txt)
from summersph_tpu.io import load_npz, read_ic_txt, save_npz, write_snapshot_txt
from summersph_tpu.state import Particles, SimState, Sinks


def _demo_state(n=17, with_sink=True):
    rng = np.random.default_rng(0)
    p = Particles.create(
        pos=rng.standard_normal((n, 3)) * 10,
        vel=rng.standard_normal((n, 3)),
        mass=rng.random(n) + 0.1,
        u=rng.random(n) + 0.5,
        alpha=rng.random(n),
        h=rng.random(n) + 1.0,
    )
    if with_sink:
        s = Sinks.create(pos=[[1.0, 2.0, 3.0]], vel=[[0.1, 0, 0]],
                         mass=[5.0], radius=[3.5], capacity=4)
    else:
        s = Sinks.create(pos=np.zeros((1, 3)), vel=np.zeros((1, 3)),
                         mass=[0.0], radius=[0.0])
    return SimState.create(p, s, t=1.25, dt=3e-3)


@pytest.mark.parametrize("columns", [8, 9, 10])
def test_txt_round_trip(tmp_path, columns):
    st = _demo_state()
    path = tmp_path / "ic.txt"
    write_snapshot_txt(path, st.particles, st.sinks, columns=columns)
    cfg = SimConfig(fixed_h=2.5)
    p2, s2 = read_ic_txt(path, cfg)

    assert int(p2.n_alive) == int(st.particles.n_alive)
    assert int(s2.n_alive) == 1
    np.testing.assert_allclose(np.asarray(p2.pos)[:17],
                               np.asarray(st.particles.pos)[:17], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.u)[:17],
                               np.asarray(st.particles.u)[:17], rtol=1e-6)
    assert float(s2.mass[0]) == pytest.approx(5.0)
    if columns >= 9:
        np.testing.assert_allclose(np.asarray(p2.alpha)[:17],
                                   np.asarray(st.particles.alpha)[:17],
                                   rtol=1e-6)
    if columns >= 10:
        np.testing.assert_allclose(np.asarray(p2.h)[:17],
                                   np.asarray(st.particles.h)[:17], rtol=1e-6)
    else:
        # fixed-h fill from config (reference reads no h column)
        assert np.allclose(np.asarray(p2.h)[:17], 2.5)


def test_no_sink_gives_dummy_origin_sink(tmp_path):
    st = _demo_state(with_sink=False)
    # drop the zero-mass sink row by masking it out before writing
    st = st.replace(sinks=st.sinks.replace(
        alive=np.zeros_like(np.asarray(st.sinks.alive))))
    path = tmp_path / "nosink.txt"
    write_snapshot_txt(path, st.particles, st.sinks)
    _, s2 = read_ic_txt(path, SimConfig())
    # SUMMER_SPH.f90:698-707: dummy zero-mass origin sink
    assert int(s2.n_alive) == 1
    assert float(s2.mass[0]) == 0.0
    np.testing.assert_allclose(np.asarray(s2.pos)[0], 0.0)


def test_malformed_file_raises(tmp_path):
    path = tmp_path / "bad.txt"
    path.write_text("header\n1 2 3\n")
    with pytest.raises(ValueError, match="columns"):
        read_ic_txt(path, SimConfig())


def test_params_round_trip(tmp_path):
    cfg = SimConfig(fixed_h=None, bounding_size=900.0, max_depth=12,
                    theta=0.7, gamma=1.6667, eta=1.3,
                    convergence_criteria=1e-4, max_length=50.0,
                    timestep_scale=0.1, end_time=123.0)
    path = tmp_path / "parameters.txt"
    write_parameters_txt(path, cfg)
    cfg2 = read_parameters_txt(path)
    for f in ("bounding_size", "max_depth", "theta", "gamma", "eta",
              "convergence_criteria", "max_length", "timestep_scale",
              "end_time"):
        assert getattr(cfg2, f) == pytest.approx(getattr(cfg, f))
    assert cfg2.fixed_h is None  # params file implies variable-h generation


def test_npz_checkpoint_exact_round_trip(tmp_path):
    st = _demo_state()
    path = tmp_path / "ck.npz"
    save_npz(path, st)
    st2 = load_npz(path)
    assert float(st2.t) == float(st.t)
    assert float(st2.dt) == float(st.dt)
    for field in st.particles.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(st2.particles, field)),
            np.asarray(getattr(st.particles, field)), err_msg=field)
    for field in st.sinks.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(st2.sinks, field)),
            np.asarray(getattr(st.sinks, field)), err_msg=field)
