"""check_type parity — mirrors the reference's own type-checking test
(tests/test_core.py:118-168) minus the pydantic Strict sentinels the
container lacks (plain int/float have the same strict semantics
here)."""

import typing

import pytest

from yamlpyowl_spark import check_type


def test_basic_shapes():
    assert check_type([1, 2], typing.List[int])
    assert check_type({"a": 1}, typing.Dict[str, int])
    assert check_type((1, "x"), typing.Tuple[int, str])
    assert check_type({1, 2}, typing.Set[int])
    assert check_type(None, typing.Optional[int])
    assert check_type(3, typing.Optional[int])
    assert check_type("anything", typing.Any)


def test_mismatches_raise_typeerror():
    # reference test_core.py:128-168 exercises exactly these failures
    with pytest.raises(TypeError):
        check_type([1, "x"], typing.List[int])
    with pytest.raises(TypeError):
        check_type({"k": "3.0"}, typing.Dict[str, float])  # no coercion
    with pytest.raises(TypeError):
        check_type({3: "v"}, typing.Dict[str, str])
    with pytest.raises(TypeError):
        check_type("notalist", typing.List[str])


def test_strict_semantics():
    # bool must not pass as int (pydantic StrictInt behavior)
    with pytest.raises(TypeError):
        check_type([True], typing.List[int])
    # int must not pass as float (StrictFloat behavior)
    with pytest.raises(TypeError):
        check_type(5, float)
    assert check_type(5.0, float)


def test_union_of_scalars():
    # reference test_core.py:166-168: mixed dict under a Union passes
    obj = {"key 1": 1, "key 2": "3.0", "key 3": 3.0}
    assert check_type(obj, typing.Dict[str, typing.Union[int, float, str]])
    with pytest.raises(TypeError):
        check_type({"key": []}, typing.Dict[str, typing.Union[int, float, str]])


def test_returns_true_for_assert_usage():
    assert check_type({}, dict) is True


def test_module_level_helpers():
    # reference exports these at module level (core.py:32, 1346, 1397, 1406)
    import yamlpyowl_spark as ypo

    assert ypo.test_type([1], typing.List[int]) is True
    assert ypo.test_type([1, "x"], typing.List[int]) is False
    assert ypo.ensure_list("a") == ["a"]
    assert ypo.ensure_list(["a"]) == ["a"]
    assert ypo.unpack_len1_mapping({"k": 1}) == ("k", 1)

    class E:
        name = "thing1"
        label = ["The Thing"]

    assert "The Thing" in ypo.render_using_label(E())
    E.label = []
    assert "thing1" in ypo.render_using_label(E())


def test_pep604_union():
    # ADVICE r02: int | str has origin types.UnionType, not typing.Union
    assert check_type(3, int | str)
    assert check_type("x", int | str)
    with pytest.raises(TypeError):
        check_type(3.5, int | str)
    assert check_type(None, int | None)


def test_bare_none_annotation_is_nonetype():
    assert check_type(None, None)
    with pytest.raises(TypeError):
        check_type(3, None)
