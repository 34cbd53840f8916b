"""Registry / factory tests (reference behavior: core/factory.py)."""

import pytest

from enhax.registry import ModelRegistry, Registry, normalize_name


def test_normalize_name():
    assert normalize_name("Zero-DCE") == "zero_dce"
    assert normalize_name("charbonnier_loss") == "charbonnier_loss"


def test_register_and_build():
    reg = Registry("test")

    @reg.register(name="thing")
    class Thing:
        def __init__(self, a=1, b=2):
            self.a, self.b = a, b

    assert "thing" in reg
    assert "Thing" in reg  # case-fuzzed
    t = reg.build("thing", config={"a": 10}, b=20)
    assert (t.a, t.b) == (10, 20)


def test_build_filters_unknown_kwargs():
    reg = Registry("test")

    @reg.register(name="f")
    def f(a=1):
        return a

    assert reg.build("f", config={"a": 3, "not_a_param": 9}) == 3


def test_duplicate_registration_raises():
    reg = Registry("test")
    reg.register(name="x", obj=object())
    with pytest.raises(KeyError):
        reg.register(name="x", obj=object())


def test_kebab_lookup():
    reg = Registry("test")
    reg.register(name="zero_dce", obj=lambda: "ok")
    assert reg.get("zero-dce")() == "ok"


def test_model_registry_arch_index():
    reg = ModelRegistry("models")

    @reg.register(name="zero_dce_re", arch="zero_dce", tasks=("llie",))
    def build_a():
        return "a"

    @reg.register(name="zero_dcepp_re", arch="zero_dce", tasks=("llie",))
    def build_b():
        return "b"

    assert reg.archs == ["zero_dce"]
    assert set(reg.models_for_arch("zero_dce")) == {"zero_dce_re", "zero_dcepp_re"}
    assert reg.models_for_task("llie") == ["zero_dce_re", "zero_dcepp_re"]


def test_build_instances():
    reg = Registry("test")
    reg.register(name="a", obj=lambda: 1)
    reg.register(name="b", obj=lambda x=0: x)
    out = reg.build_instances(["a", {"name": "b", "x": 5}])
    assert out == [1, 5]
