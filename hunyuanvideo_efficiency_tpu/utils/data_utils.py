"""Small data helpers (reference: hyvideo/utils/data_utils.py, helpers.py)."""
from __future__ import annotations

import collections.abc
from itertools import repeat


def align_to(value: int, alignment: int) -> int:
    """Round `value` up to the nearest multiple of `alignment`."""
    return int(((value + alignment - 1) // alignment) * alignment)


def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            x = tuple(x)
            if len(x) == 1:
                x = tuple(repeat(x[0], n))
            return x
        return tuple(repeat(x, n))

    return parse


to_1tuple = _ntuple(1)
to_2tuple = _ntuple(2)
to_3tuple = _ntuple(3)
to_4tuple = _ntuple(4)
