"""AutoAugment / RandAugment tests."""

import numpy as np
import pytest
from PIL import Image

from scouter_tpu.data.auto_augment import (
    AutoAugment,
    RandAugment,
    auto_augment_policy,
    rand_augment_ops,
)


def _img():
    rng = np.random.RandomState(0)
    return Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))


def test_policies_are_wellformed():
    for name in ("v0", "original"):
        policy = auto_augment_policy(name)
        assert len(policy) >= 15
        for sub in policy:
            for op, prob, mag in sub:
                from scouter_tpu.data.auto_augment import _OPS

                assert op in _OPS
                assert 0.0 <= prob <= 1.0
                assert 0 <= mag <= 10


def test_autoaugment_runs_and_is_deterministic_with_seed():
    img = _img()
    a1 = AutoAugment("v0", seed=7)(img)
    # reseed both the policy RNG and the magnitude-negation RNG
    import random

    random.seed(123)
    a1 = np.asarray(AutoAugment("v0", seed=7)(img))
    random.seed(123)
    a2 = np.asarray(AutoAugment("v0", seed=7)(img))
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == (32, 32, 3)


def test_randaugment_applies_n_ops():
    img = _img()
    out = RandAugment(num_layers=3, magnitude=9, seed=1)(img)
    assert out.size == img.size


def test_each_op_individually():
    from scouter_tpu.data.auto_augment import _apply

    img = _img()
    for op in rand_augment_ops():
        out = _apply(img, op, 5)
        assert out.size == img.size


class TestReferenceTableParity:
    """Level->magnitude rules and policy tables vs the vendored timm
    auto_augment (timm/data/auto_augment.py)."""

    @staticmethod
    def _ref_mod():
        import sys

        from test_models import install_reference_stubs

        install_reference_stubs()
        from timm.data import auto_augment as ref_aa
        return ref_aa

    def test_level_to_arg_tables(self):
        import random

        ref_aa = self._ref_mod()
        from scouter_tpu.data.auto_augment import _OPS

        for name, (_, to_arg) in _OPS.items():
            ref_fn = ref_aa.LEVEL_TO_ARG[name]
            for level in range(11):
                random.seed(1234 + level)
                want = ref_fn(level, ref_aa._HPARAMS_DEFAULT) if ref_fn else None
                random.seed(1234 + level)
                got = to_arg(level)
                if want is None:
                    assert got is None, name
                else:
                    assert len(want) == 1
                    assert got == pytest.approx(want[0]), (name, level, got, want)

    @pytest.mark.parametrize("policy", ["v0", "original"])
    def test_policy_tables(self, policy):
        ref_aa = self._ref_mod()
        from scouter_tpu.data.auto_augment import auto_augment_policy

        ref_policy = ref_aa.auto_augment_policy(policy)
        mine = auto_augment_policy(policy)
        assert len(ref_policy) == len(mine)
        for ref_sub, my_sub in zip(ref_policy, mine):
            assert len(ref_sub) == len(my_sub)
            for ref_op, (name, prob, magnitude) in zip(ref_sub, my_sub):
                assert ref_op.prob == pytest.approx(prob)
                assert ref_op.magnitude == pytest.approx(magnitude)
                assert ref_op.level_fn is (ref_aa.LEVEL_TO_ARG[name] or None), name
                assert ref_op.aug_fn is ref_aa.NAME_TO_OP[name], name

    def test_rand_augment_default_ops(self):
        ref_aa = self._ref_mod()
        from scouter_tpu.data.auto_augment import rand_augment_ops

        assert list(rand_augment_ops()) == list(ref_aa._RAND_TRANSFORMS)
