"""``check_type(obj, expected_type)`` — parity with the reference's
public helper (core.py:1365-1392), which wraps pydantic validation.

pydantic is not in this runtime, so this is a structural validator for
the ``typing`` constructs the reference's own tests exercise
(tests/test_core.py:118-168): primitives, ``Union``/``Optional``,
``List[T]``, ``Dict[K, V]``, ``Tuple[...]``, ``Set[T]``, ``Any`` —
with pydantic-Strict semantics (``bool`` is NOT an ``int``; no numeric
coercion: ``"3.0"`` is not a ``float``). If pydantic IS importable its
Strict* sentinel types are honored too.

Same contract: returns ``True`` on success so ``assert
check_type(...)`` can be compiled out with ``python -O``; raises
``TypeError`` on mismatch.
"""

from __future__ import annotations

import types as _types
import typing

_UNION_TYPE = getattr(_types, "UnionType", None)  # PEP 604 (py >= 3.10)

try:  # pragma: no cover - exercised only where pydantic exists
    import pydantic

    _STRICT = {
        getattr(pydantic, n, None): t
        for n, t in (
            ("StrictInt", int),
            ("StrictFloat", float),
            ("StrictStr", str),
            ("StrictBool", bool),
        )
    }
    _STRICT.pop(None, None)
except Exception:  # pydantic absent (this container) or incompatible
    _STRICT = {}


def _matches(obj, tp) -> bool:
    if tp is typing.Any:
        return True
    if tp is None:  # a bare None annotation means NoneType, not Any
        return obj is None
    if tp in _STRICT:
        tp = _STRICT[tp]
    origin = typing.get_origin(tp)
    args = typing.get_args(tp)
    # typing.Union[int, str] has origin typing.Union; PEP 604 `int | str`
    # has origin types.UnionType — accept both (ADVICE r02)
    if origin is typing.Union or (_UNION_TYPE is not None and origin is _UNION_TYPE):
        return any(_matches(obj, a) for a in args)
    if origin in (list, typing.List):
        return isinstance(obj, list) and all(_matches(x, args[0]) for x in obj) if args else isinstance(obj, list)
    if origin in (dict, typing.Dict):
        if not isinstance(obj, dict):
            return False
        if not args:
            return True
        return all(_matches(k, args[0]) and _matches(v, args[1]) for k, v in obj.items())
    if origin in (set, typing.Set):
        return isinstance(obj, set) and (not args or all(_matches(x, args[0]) for x in obj))
    if origin in (tuple, typing.Tuple):
        if not isinstance(obj, tuple):
            return False
        if not args:
            return True
        if len(args) == 2 and args[1] is Ellipsis:
            return all(_matches(x, args[0]) for x in obj)
        return len(obj) == len(args) and all(_matches(x, a) for x, a in zip(obj, args))
    if tp is float:
        # strict: ints are acceptable floats mathematically but
        # pydantic StrictFloat rejects them; the reference's tests use
        # plain float via Union, where int should NOT satisfy float
        return isinstance(obj, float) and not isinstance(obj, bool)
    if tp is int:
        # bool is a subclass of int but must not pass as one (strict)
        return isinstance(obj, int) and not isinstance(obj, bool)
    if isinstance(tp, type):
        return isinstance(obj, tp)
    return False


def check_type(obj, expected_type) -> bool:
    """Validate ``obj`` against a ``typing`` construct; ``True`` or
    ``TypeError`` (reference core.py:1365-1392 contract)."""
    if not _matches(obj, expected_type):
        raise TypeError(
            f"Unexpected type: {type(obj).__name__!s} does not match {expected_type!r}"
        )
    return True


def test_type(obj, expected_type) -> bool:
    """Non-raising variant: True/False (reference core.py:1397-1403)."""
    try:
        return check_type(obj, expected_type)
    except TypeError:
        return False
