"""Round-9 fixes: the r8 VERDICT punch list + ADVICE findings.

- id-column cast matrix for ``_check_integral_narrowing`` (ADVICE:
  integral→floating precision loss for ids)
- admit-lane null/NaN edge tests live in test_minhash_index.py /
  test_streaming.py siblings; the skew routing and IVF compaction
  tests are added alongside their features below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pydiverse_transform_spark.extras.similarity import (
    _check_integral_narrowing,
)


@pytest.mark.parametrize("src,dst,id_col,ok", [
    # integral narrowing: refused regardless of id-ness
    (T.LongType(), T.IntegerType(), False, False),
    (T.LongType(), T.IntegerType(), True, False),
    (T.IntegerType(), T.ShortType(), True, False),
    # widening / same width: fine
    (T.IntegerType(), T.LongType(), True, True),
    (T.LongType(), T.LongType(), True, True),
    # integral -> floating, NON-id column (vector alignment): allowed
    (T.LongType(), T.DoubleType(), False, True),
    (T.LongType(), T.FloatType(), False, True),
    # integral -> floating, id column: allowed only within the float
    # type's exact-integer range (double exact to 2^53 covers int,
    # not long; float exact to 2^24 covers short, not int)
    (T.IntegerType(), T.DoubleType(), True, True),
    (T.ShortType(), T.FloatType(), True, True),
    (T.ByteType(), T.FloatType(), True, True),
    (T.LongType(), T.DoubleType(), True, False),
    (T.IntegerType(), T.FloatType(), True, False),
    (T.LongType(), T.FloatType(), True, False),
    # float -> float narrowing stays allowed everywhere (the intended
    # double-vectors-into-float-index alignment)
    (T.DoubleType(), T.FloatType(), False, True),
    (T.DoubleType(), T.FloatType(), True, True),
    # strings etc. are not this guard's business
    (T.StringType(), T.DoubleType(), True, True),
])
def test_id_cast_guard_matrix(src, dst, id_col, ok):
    if ok:
        _check_integral_narrowing(src, dst, "c", id_col=id_col)
    else:
        with pytest.raises(ValueError):
            _check_integral_narrowing(src, dst, "c", id_col=id_col)
