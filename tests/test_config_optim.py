"""CLI flag surface and optimizer/schedule parity."""

import jax.numpy as jnp
import numpy as np
import pytest
import optax

from selavi_tpu.config import parse_arguments
from selavi_tpu.train.optim import make_optimizer, warmup_lr


def test_reference_flag_surface_accepted():
    # the reference master.sh flag set (scripts/master.sh:80-106 subset)
    argv = (
        "--ds_name vggsound --mlp_dim 309 --headcount 10 --match true "
        "--distribution gauss --epochs 201 --batch_size 16 --base_lr 1e-2 "
        "--wd 1e-5 --warmup_epochs 10 --nopts 100 --schedulepower 1.5 "
        "--lamb 20 --num_frames 30 --aud_sample_rate 24000 "
        "--aud_spec_type 2 --use_volume_jittering true --ind_groups 2 "
        "--gauss_sd 0.1 --diff_dist_per_head true --workers 10 "
        "--checkpoint_freq 5 --seed 31 --dump_path /tmp/x"
    ).split()
    args = parse_arguments().parse_args(argv)
    assert args.mlp_dim == 309
    assert args.headcount == 10
    assert args.match is True
    assert args.distribution == "gauss"
    assert args.use_volume_jittering is True
    assert args.lamb == 20


def test_warmup_lr_matches_torch_scheduler_semantics():
    # GradualWarmupScheduler(multiplier=W, total_epoch=T):
    # lr(e) = base * (1 + (W-1) * min(e,T)/T)
    base, w, t = 0.01, 8.0, 10
    assert warmup_lr(0, base, w, t) == base
    assert np.isclose(warmup_lr(5, base, w, t), base * (1 + 7 * 0.5))
    assert np.isclose(warmup_lr(10, base, w, t), base * 8)
    assert np.isclose(warmup_lr(50, base, w, t), base * 8)
    assert warmup_lr(3, base, w, t, use_warmup=False) == base


def test_sgd_matches_torch_update_rule():
    """One optax step == torch SGD(momentum, wd): p -= lr*(mu*buf + g + wd*p)."""
    lr, mu, wd = 0.1, 0.9, 0.01
    tx = make_optimizer(lr, wd, momentum=mu, use_warmup=False)
    p = {"w": jnp.asarray([1.0, -2.0])}
    g = {"w": jnp.asarray([0.5, 0.25])}
    state = tx.init(p)
    # step 1: buf = g + wd*p; p1 = p - lr*buf
    updates, state = tx.update(g, state, p)
    p1 = optax.apply_updates(p, updates)
    buf = np.asarray(g["w"]) + wd * np.asarray(p["w"])
    expected1 = np.asarray(p["w"]) - lr * buf
    np.testing.assert_allclose(np.asarray(p1["w"]), expected1, rtol=1e-6)
    # step 2: buf = mu*buf + (g + wd*p1); p2 = p1 - lr*buf
    updates, state = tx.update(g, state, p1)
    p2 = optax.apply_updates(p1, updates)
    buf = mu * buf + (np.asarray(g["w"]) + wd * expected1)
    expected2 = expected1 - lr * buf
    np.testing.assert_allclose(np.asarray(p2["w"]), expected2, rtol=1e-6)


def test_warmup_schedule_in_optimizer_steps():
    # lr should scale by epoch via the step->epoch mapping
    tx = make_optimizer(
        1.0, 0.0, momentum=0.0, multiplier=4.0, warmup_epochs=2,
        batches_per_epoch=2,
    )
    p = {"w": jnp.asarray([0.0])}
    g = {"w": jnp.asarray([1.0])}
    state = tx.init(p)
    lrs = []
    cur = p
    for step in range(6):
        updates, state = tx.update(g, state, cur)
        lrs.append(float(-updates["w"][0]))
        cur = optax.apply_updates(cur, updates)
    # epochs 0,0,1,1,2,2 -> factors 1, 1, 2.5, 2.5, 4, 4
    np.testing.assert_allclose(lrs, [1, 1, 2.5, 2.5, 4, 4], rtol=1e-6)


# --- generic GradualWarmup chaining (reference warmup_scheduler.py:25-80) ---


def test_gradual_warmup_chain_multistep():
    from selavi_tpu.train.optim import GradualWarmupChain, multistep_factor

    # used-config cross-check: multiplier=8, warmup 2, MultiStep(4,8)@0.1
    sched = GradualWarmupChain(
        base_lr=0.1, multiplier=8.0, total_epoch=2,
        after=multistep_factor([4, 8], 0.1),
    )
    assert np.isclose(sched.lr(0), 0.1)
    assert np.isclose(sched.lr(1), 0.1 * (7 * 0.5 + 1))
    assert np.isclose(sched.lr(2), 0.8)
    assert np.isclose(sched.lr(3), 0.8)          # shifted epoch 1 < 4
    assert np.isclose(sched.lr(6), 0.8 * 0.1)    # shifted 4 >= 4
    assert np.isclose(sched.lr(10), 0.8 * 0.01)  # shifted 8 >= 8
    # multiplier == 1 ramps from 0 (reference :42-43)
    ramp = GradualWarmupChain(base_lr=0.2, multiplier=1.0, total_epoch=4)
    assert ramp.lr(0) == 0.0
    assert np.isclose(ramp.lr(2), 0.1)
    assert np.isclose(ramp.lr(7), 0.2)  # no after: holds target
    with pytest.raises(ValueError):
        GradualWarmupChain(base_lr=0.1, multiplier=0.5)


@pytest.mark.parametrize(
    "mode,thr_mode,patience,cooldown",
    [("min", "rel", 2, 0), ("min", "abs", 1, 2), ("max", "rel", 3, 1)],
)
def test_reduce_on_plateau_matches_torch(mode, thr_mode, patience, cooldown):
    import torch

    from selavi_tpu.train.optim import ReduceOnPlateau

    base = 0.5
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode=mode, factor=0.5, patience=patience,
        threshold=1e-3, threshold_mode=thr_mode, cooldown=cooldown,
    )
    ours = ReduceOnPlateau(
        mode=mode, gamma=0.5, patience=patience,
        threshold=1e-3, threshold_mode=thr_mode, cooldown=cooldown,
    )
    state = ours.init()
    rng = np.random.default_rng(0)
    metric = 1.0
    for _ in range(40):
        metric += rng.normal(0, 0.05) - 0.002  # noisy, slowly improving
        tsched.step(metric)
        state = ours.step(state, metric)
        torch_lr = opt.param_groups[0]["lr"]
        assert np.isclose(base * state.factor, torch_lr), (
            state, torch_lr)


def test_gradual_warmup_plateau_path():
    from selavi_tpu.train.optim import GradualWarmupPlateau, ReduceOnPlateau

    sched = GradualWarmupPlateau(
        base_lr=0.1, multiplier=2.0, total_epoch=3,
        plateau=ReduceOnPlateau(gamma=0.1, patience=1),
    )
    state = sched.init()
    lrs = []
    for epoch, metric in enumerate([5.0, 4.0, 3.0, 3.0, 3.0, 3.0, 3.0]):
        state, lr = sched.step(state, metric, epoch)
        lrs.append(lr)
    # epoch 0 treated as 1 (reference :50): same LR as epoch 1
    assert np.isclose(lrs[0], lrs[1])
    # warmup top at total_epoch: base * multiplier
    assert np.isclose(lrs[3 - 1], 0.1 * (1 * 2 / 3 + 1))
    # metrics 3.0 repeat: with patience=1, the 2nd consecutive bad epoch
    # after the plateau controller engages triggers a 0.1x reduction
    assert np.isclose(lrs[-1], 0.2 * 0.1)
