"""Full-registry constructor sweep: every entrypoint must build and forward.

The parity suites cover representatives per mechanism and the zoo smoke builds
one entrypoint per family — this sweep closes the long tail (efficientnet_b8,
hrnet_w64, resnest269e, dpn107, every tf_ twin, ...) that had never been
instantiated even at shape level. ``jax.eval_shape`` traces init + forward
without allocating, so the whole registry is minutes, not hours.

The zoo IS the spec: parity target ``timm/models/registry.py:45-73`` — every
``@register_model`` entrypoint in the reference must construct here too.
"""

import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.models import create_model, list_models

# Architectures whose stride pyramid needs more than 64px to keep every
# feature map non-empty (matching the reference's default_cfg input sizes:
# nasnet/pnasnet 331px, inception family 299px).
_MIN_SIZE = {
    "nasnetalarge": 96,
    "pnasnet5large": 96,
    "inception_v3": 75,
    "tf_inception_v3": 75,
    "adv_inception_v3": 75,
    "gluon_inception_v3": 75,
    "inception_v4": 75,
    "inception_resnet_v2": 75,
    "ens_adv_inception_resnet_v2": 75,
}


def _sweep(name):
    size = _MIN_SIZE.get(name, 64)
    model = create_model(name, num_classes=7)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False)
        if _takes_train(model) else model.apply(v, x),
        variables, x)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, f"{name}: empty output"
    logits = leaves[0]
    assert logits.shape == (1, 7), f"{name}: logits {logits.shape}"


def _takes_train(model):
    import inspect

    try:
        return "train" in inspect.signature(model.__call__).parameters
    except (TypeError, ValueError):
        return False


def test_registry_is_complete():
    """295 reference timm entrypoints (VERDICT r3 re-verified the diff) —
    the registry must never shrink."""
    assert len(list_models()) >= 295


@pytest.mark.slow
def test_every_entrypoint_builds_and_forwards():
    """Aggregated sweep over ALL registry names; reports the full failure
    list at once so one tail typo doesn't hide the next."""
    failures = []
    for name in list_models():
        try:
            _sweep(name)
        except Exception as e:  # noqa: BLE001 — collecting, not handling
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, (
        f"{len(failures)}/{len(list_models())} entrypoints failed:\n"
        + "\n".join(failures[:40]))
