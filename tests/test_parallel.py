"""Sharded SPMD training on the virtual 8-device CPU mesh.

Validates the multi-chip design without hardware (SURVEY.md §4): the full
train step compiles and executes under pjit with the batch sharded over the
``data`` axis, and produces the same numbers as the single-device step
(collective-consistent adaptivity + correct psum placement)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import Mode, SolverConfig
from continuousnormalizingflows_tpu.parallel import (
    data_sharding,
    make_mesh,
    shard_batch_arrays,
    shard_mlp_params,
    shard_train_step,
)

FAST = SolverConfig(method="rk4", gradient="backprop", fixed_steps=16)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_sharded_loss_matches_single_device():
    icnf = cnf.ICNF.create(nvariables=2, solver=FAST)
    params = icnf.init(jax.random.PRNGKey(0))
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    key = jax.random.PRNGKey(2)

    l_single = cnf.loss(icnf, Mode.TRAIN, x, params, key=key)

    mesh = make_mesh()
    xs, _ = shard_batch_arrays(mesh, x)
    l_shard = jax.jit(
        lambda p, xx: cnf.loss(icnf, Mode.TRAIN, xx, p, key=key),
        in_shardings=(None, data_sharding(mesh)),
    )(params, xs)
    np.testing.assert_allclose(float(l_single), float(l_shard), rtol=2e-4)


def test_sharded_train_step_runs_and_matches():
    icnf = cnf.ICNF.create(nvariables=2, solver=FAST)
    params = icnf.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    key = jax.random.PRNGKey(2)

    def step(params, opt_state, key, xs, ys):
        l, grads = jax.value_and_grad(
            lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=key)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    # single-device reference (no donation so inputs stay alive)
    p_ref, _, l_ref = jax.jit(step)(params, opt_state, key, x, None)

    mesh = make_mesh()
    sharded = shard_train_step(step, mesh, conditional=False)
    xs, _ = shard_batch_arrays(mesh, x)
    p_sh, _, l_sh = sharded(params, opt.init(params), key, xs, None)

    np.testing.assert_allclose(float(l_ref), float(l_sh), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


def test_sharded_adaptive_solver_consistent():
    """Adaptive dopri5 under pjit: global error norm -> all devices agree on
    the step sequence; result equals the unsharded solve."""
    icnf = cnf.ICNF.create(
        nvariables=2, solver=SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4)
    )
    params = icnf.init(jax.random.PRNGKey(0))
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (64, 2))

    lp_single, _, nfe_single = cnf.inference(icnf, Mode.TEST, x, params)

    mesh = make_mesh()
    xs, _ = shard_batch_arrays(mesh, x)
    lp_shard, _, nfe_shard = jax.jit(
        lambda p, xx: cnf.inference(icnf, Mode.TEST, xx, p),
        in_shardings=(None, data_sharding(mesh)),
    )(params, xs)
    np.testing.assert_allclose(
        np.asarray(lp_single), np.asarray(lp_shard), rtol=1e-4, atol=1e-5
    )
    assert int(nfe_single) == int(nfe_shard)


def test_tensor_parallel_train_step_matches():
    """data=4 x model=2 mesh with Megatron-sharded MLP params (column-parallel
    layer 0, row-parallel layer 1): full train step must reproduce the
    single-device numbers — validates the TP scheme + GSPMD all-reduce
    placement (SURVEY §2.9 'TP' entry; no reference counterpart)."""
    # wider hidden dim so the model-axis split is nontrivial (h=32 -> 16+16)
    from continuousnormalizingflows_tpu.models.nets import MLP

    cfg = cnf.ICNFConfig(nvariables=2, solver=FAST)
    net = MLP((cfg.n_in, 32, 32, cfg.n_out))
    icnf = cnf.ICNF(config=cfg, net=net)
    params = icnf.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    key = jax.random.PRNGKey(2)

    def step(params, opt_state, key, xs, ys):
        l, grads = jax.value_and_grad(
            lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=key)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    p_ref, _, l_ref = jax.jit(step)(params, opt.init(params), key, x, None)

    mesh = make_mesh(data=4, model=2)
    p_tp = shard_mlp_params(mesh, params)
    assert "model" in str(p_tp[0]["w"].sharding.spec)
    opt_tp = opt.init(p_tp)  # optimizer state inherits the param shardings
    sharded = shard_train_step(step, mesh, conditional=False, tensor_parallel=True)
    xs, _ = shard_batch_arrays(mesh, x)
    p_sh, _, l_sh = sharded(p_tp, opt_tp, key, xs, None)

    np.testing.assert_allclose(float(l_ref), float(l_sh), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)
    # updated params keep their TP shardings (no silent gather-to-replicated)
    assert "model" in str(p_sh[0]["w"].sharding.spec)


def test_host_local_batch_single_process():
    from continuousnormalizingflows_tpu.parallel import host_local_batch

    mesh = make_mesh()
    x = jnp.arange(64, dtype=jnp.float32).reshape(32, 2)
    gx = host_local_batch(mesh, x)
    assert gx.shape == (32, 2)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(x))
    assert "data" in str(gx.sharding.spec)


def test_estimator_with_mesh():
    """ICNFModel(mesh=...) trains end-to-end on the sharded path."""
    icnf = cnf.ICNF.create(nvariables=1, solver=FAST)
    mesh = make_mesh()
    x = jax.random.beta(jax.random.PRNGKey(0), 2.0, 4.0, (256, 1), jnp.float32)
    model = cnf.ICNFModel(icnf, batchsize=64, epochs=2, mesh=mesh, key=jax.random.PRNGKey(1))
    result = model.fit(x)
    assert np.isfinite(result.stats["final_loss"])


def test_probe_axis_sharding_parity():
    """nprobes > 1 sharded over the mesh 'model' axis (cfg.probe_axis): the
    trace-ensemble mean becomes a psum; results must equal the replicated
    run bit-for-bit (same key -> same probes, only placement differs)."""
    solver = SolverConfig(method="rk4", gradient="backprop", fixed_steps=8)
    icnf_repl = cnf.ICNF.create(nvariables=2, nprobes=2, solver=solver)
    icnf_shard = cnf.ICNF.create(
        nvariables=2, nprobes=2, probe_axis="model", solver=solver
    )
    params = icnf_repl.init(jax.random.PRNGKey(0))
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    key = jax.random.PRNGKey(2)

    lp_repl, _, _ = cnf.inference(icnf_repl, Mode.TRAIN, x, params, key=key)

    mesh = make_mesh(model=2)  # data=4 x model=2
    xs, _ = shard_batch_arrays(mesh, x)
    with jax.set_mesh(mesh):
        lp_shard, _, _ = jax.jit(
            lambda p, xx: cnf.inference(icnf_shard, Mode.TRAIN, xx, p, key=key),
            in_shardings=(None, data_sharding(mesh)),
        )(params, xs)
    np.testing.assert_allclose(
        np.asarray(lp_repl), np.asarray(lp_shard), rtol=1e-5, atol=1e-6
    )


def test_spmd_collective_inventory_does_not_scale_with_devices():
    """Audit the compiled SPMD *program*, not just its outputs (VERDICT
    round-4 item 5): on the data-parallel mesh the adaptive train step's
    collective inventory must consist of all-reduces only (one gradient
    all-reduce class in the entry computation + the error-norm/loss
    reductions inside the while bodies), and the number of collective ops
    must be IDENTICAL at 4 and 8 devices — per-step communication does not
    scale with device count, the mechanism behind the >=80% weak-scaling
    target (SURVEY §2.9/§5; measured counts recorded in PARITY round 5).
    The reference's own gate is relative same-run judgement
    (.github/workflows/Benchmark.yml:22-31); this is the compile-time
    analogue for the comm layer."""
    import re

    icnf = cnf.ICNF.create(
        nvariables=2,
        solver=SolverConfig(method="dopri5", rtol=1e-3, atol=1e-3,
                            gradient="adjoint"),
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 2)), jnp.float32)
    p = icnf.init(jax.random.PRNGKey(1))

    def inventory(ndev):
        mesh = make_mesh(devices=jax.devices()[:ndev], model=1)
        m = cnf.ICNFModel(icnf, mesh=mesh, batchsize=0, epochs=1)
        fn = m._make_step()
        opt_state = m.optimizer.init(p)
        txt = fn.lower(p, opt_state, jax.random.PRNGKey(2), x, None)\
                .compile().as_text()
        # op-definition sites: "<name> = <shape> <op>(" — count per op kind
        # (the shape may be a spacey tuple, so anchor on " <op>(" directly)
        kinds = {
            k: len(re.findall(rf"=[^=\n]*\s{k}(?:\.\d+)?\(", txt))
            for k in ("all-reduce", "all-gather", "all-to-all",
                      "collective-permute", "reduce-scatter")
        }
        # placement: all-reduce definitions in the entry computation (the
        # gradient reduction) vs inside while-body regions (error norm/loss)
        blocks = re.split(r"\n\n", txt)
        entry_ar = body_ar = 0
        for b in blocks:
            n = len(re.findall(r"all-reduce[\w.]*\s+=", b))
            if b.startswith("ENTRY"):
                entry_ar += n
            elif n:
                body_ar += n
        return kinds, entry_ar, body_ar

    kinds4, entry4, body4 = inventory(4)
    kinds8, entry8, body8 = inventory(8)

    # reductions only — a data-parallel CNF step needs no gathers/permutes
    assert kinds8["all-reduce"] >= 2, kinds8
    for k, v in kinds8.items():
        if k != "all-reduce":
            assert v == 0, (k, kinds8)
    # the gradient all-reduce class lives in the entry computation
    assert entry8 >= 1, "missing gradient all-reduce in entry"
    # the adaptive error-norm/loss reductions live inside the loop bodies
    assert body8 >= 1, "missing error-norm reduction in while body"
    # invariance in device count: same op inventory, same placement
    assert (kinds4, entry4, body4) == (kinds8, entry8, body8), (
        (kinds4, entry4, body4), (kinds8, entry8, body8)
    )
