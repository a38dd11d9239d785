"""RepeatingContainer — fan the same operations out to N objects.

Re-expresses the reference's ``RepeatingContainer``
(datatest/_vendor/repeatingcontainer.py:34-264) from scratch: a small
driver-side convenience that repeats attribute lookups, method calls,
item access, and operator expressions on every contained object and
wraps the results in a new container.  In this engine the typical
contents are DataFrames or ValidationResults — e.g. running the same
rule set against a current and a baseline table in one expression:

    >>> pair = RepeatingContainer([df_current, df_baseline])
    >>> counts = pair.groupBy("codec").count()
    >>> cur, base = counts  # unpack per-object results

The heavy lifting stays in Spark (each forwarded call just builds
lineage); the container itself is pure driver-side sugar.  A mapping
input keeps its keys: iteration yields ``(key, result)`` pairs so
``dict(container.method())`` round-trips.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

__all__ = ["RepeatingContainer"]


def _fanout_binary(op_name):
    def op(self, other):
        if isinstance(other, RepeatingContainer):
            if len(other._objs) != len(self._objs):
                raise ValueError("containers must hold the same number of objects")
            pairs = zip(self._objs, other._objs)
        else:
            pairs = ((x, other) for x in self._objs)
        results = [getattr(x, op_name)(y) for x, y in pairs]
        if any(r is NotImplemented for r in results):
            return NotImplemented
        return self._rewrap(results)

    op.__name__ = op_name
    return op


class RepeatingContainer:
    """Repeat lookups/calls/operators on every contained object."""

    def __init__(self, iterable):
        if isinstance(iterable, str) or not isinstance(iterable, Iterable):
            raise TypeError("expected a non-string iterable")
        if isinstance(iterable, Mapping):
            self._keys = tuple(iterable.keys())
            self._objs = tuple(iterable.values())
        else:
            self._keys = ()
            self._objs = tuple(iterable)

    def _rewrap(self, results):
        new = object.__new__(RepeatingContainer)
        new._keys = self._keys
        new._objs = tuple(results)
        return new

    # --- container protocol ------------------------------------------------
    def __iter__(self):
        if self._keys:
            return iter(zip(self._keys, self._objs))
        return iter(self._objs)

    def __len__(self):
        return len(self._objs)

    def __repr__(self):
        if self._keys:
            body = ", ".join(
                f"{k!r}: {v!r}" for k, v in zip(self._keys, self._objs)
            )
            return f"RepeatingContainer({{{body}}})"
        body = ", ".join(repr(x) for x in self._objs)
        return f"RepeatingContainer([{body}])"

    def __eq__(self, other):
        # NOTE: like the reference, ``==`` FANS OUT (it compares the
        # contained objects element-wise and returns a container); use
        # ``equals_container`` for container identity.
        return self._rewrap([x == other for x in self._objs])

    def equals_container(self, other) -> bool:
        return (
            isinstance(other, RepeatingContainer)
            and self._objs == other._objs
            and self._keys == other._keys
        )

    # --- fan-out core --------------------------------------------------------
    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return self._rewrap([getattr(x, name) for x in self._objs])

    def __call__(self, *args, **kwargs):
        return self._rewrap([x(*args, **kwargs) for x in self._objs])

    def __getitem__(self, key):
        return self._rewrap([x[key] for x in self._objs])

    # --- forwarded operators -------------------------------------------------
    __add__ = _fanout_binary("__add__")
    __sub__ = _fanout_binary("__sub__")
    __mul__ = _fanout_binary("__mul__")
    __truediv__ = _fanout_binary("__truediv__")
    __floordiv__ = _fanout_binary("__floordiv__")
    __mod__ = _fanout_binary("__mod__")
    __pow__ = _fanout_binary("__pow__")
    __radd__ = _fanout_binary("__radd__")
    __rsub__ = _fanout_binary("__rsub__")
    __rmul__ = _fanout_binary("__rmul__")
    __rtruediv__ = _fanout_binary("__rtruediv__")
    __lt__ = _fanout_binary("__lt__")
    __le__ = _fanout_binary("__le__")
    __gt__ = _fanout_binary("__gt__")
    __ge__ = _fanout_binary("__ge__")
