"""Type system for the PySpark-native transform engine.

Re-implements the semantics of the reference's type lattice
(reference: src/pydiverse/transform/_internal/tree/types.py) on top of
Spark SQL types: abstract Int/Float, implicit-conversion lattice with
costs, least-common-ancestor for case/union merging, and a valid-cast
table.  Spark has no unsigned ints — UInt{8,16,32,64} map to the
next-wider signed type (documented divergence).
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal as _PyDecimal

from pyspark.sql import types as T

__all__ = [
    "Dtype",
    "Bool",
    "Int",
    "Int8",
    "Int16",
    "Int32",
    "Int64",
    "UInt8",
    "UInt16",
    "UInt32",
    "UInt64",
    "Float",
    "Float32",
    "Float64",
    "Decimal",
    "String",
    "Date",
    "Datetime",
    "Time",
    "Duration",
    "List",
    "NullType",
    "lca_type",
    "converts_to",
    "to_spark_type",
    "from_spark_type",
    "infer_literal_type",
    "can_cast",
    "COMPARABLE",
    "NUMERIC",
]


class Dtype:
    """Base class: instances are cheap value objects; equality is structural."""

    __slots__ = ()
    name: str = "?"

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))

    def __repr__(self):
        return self.name

    # --- lattice -------------------------------------------------------
    def base(self) -> "Dtype":
        """Collapse concrete widths to the abstract family head."""
        return self

    def is_int(self) -> bool:
        return isinstance(self, Int)

    def is_float(self) -> bool:
        return isinstance(self, Float)

    def is_numeric(self) -> bool:
        return self.is_int() or self.is_float()


class Bool(Dtype):
    name = "bool"


class Int(Dtype):
    name = "int"
    spark = T.LongType()

    def base(self):
        return Int()


class Int8(Int):
    name = "int8"
    spark = T.ByteType()


class Int16(Int):
    name = "int16"
    spark = T.ShortType()


class Int32(Int):
    name = "int32"
    spark = T.IntegerType()


class Int64(Int):
    name = "int64"
    spark = T.LongType()


# Unsigned ints: Spark has no unsigned types; widen to next signed.
class UInt8(Int):
    name = "uint8"
    spark = T.ShortType()


class UInt16(Int):
    name = "uint16"
    spark = T.IntegerType()


class UInt32(Int):
    name = "uint32"
    spark = T.LongType()


class UInt64(Int):
    name = "uint64"
    spark = T.LongType()


class Float(Dtype):
    name = "float"
    spark = T.DoubleType()

    def base(self):
        return Float()


class Float32(Float):
    name = "float32"
    spark = T.FloatType()


class Float64(Float):
    name = "float64"
    spark = T.DoubleType()


class Decimal(Float):
    """Decimal(p, s) — subtype of Float (matches reference since 0.4.0)."""

    __slots__ = ("precision", "scale")
    name = "decimal"

    def __init__(self, precision: int = 38, scale: int = 10):
        self.precision = precision
        self.scale = scale

    def __eq__(self, other):
        return (
            type(other) is Decimal
            and other.precision == self.precision
            and other.scale == self.scale
        )

    def __hash__(self):
        return hash((Decimal, self.precision, self.scale))

    def __repr__(self):
        return f"decimal({self.precision},{self.scale})"

    def base(self):
        return self


class String(Dtype):
    """``max_length`` mirrors the reference's ``String(max_length=)``
    (reference tree/types.py:104-109): a declared upper bound on the
    string length.  Spark's StringType is unbounded, so the bound is a
    *type-lattice* fact (it gates implicit conversions exactly like the
    reference) rather than a storage fact; ``to_spark_type`` still maps
    to StringType because VarcharType is not usable in DataFrame casts.
    """

    __slots__ = ("max_length",)
    name = "str"

    def __init__(self, max_length: int | None = None):
        self.max_length = max_length

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and getattr(other, "max_length", None) == self.max_length
        )

    def __hash__(self):
        return hash((type(self), self.max_length))

    def __repr__(self):
        if self.max_length is not None:
            return f"str({self.max_length})"
        return "str"


class Enum(String):
    __slots__ = ("values",)
    name = "enum"

    def __init__(self, *values: str):
        super().__init__()
        self.values = tuple(values)


class Date(Dtype):
    name = "date"


class Datetime(Dtype):
    name = "datetime"


class Time(Dtype):
    """Time of day (reference tree/types.py Time).

    Spark SQL has no TIME type, so the physical representation is
    µs-since-midnight in a LongType — exact, orderable, and
    SQL-portable, the same convention :class:`Duration` uses for its
    µs representation.  Comparisons, min/max, sorting, fill_null,
    coalesce and clip work through the reference's COMPARABLE
    signatures; ``datetime.time`` literals convert automatically.
    Columns enter the type via ``.cast(Time())`` from Datetime
    (time-of-day extraction, wall-clock) or String
    ('HH:MM:SS[.ffffff]'), and leave as µs longs on export (like
    Duration — documented divergence from the reference's
    ``datetime.time`` objects)."""

    name = "time"


class Duration(Dtype):
    """Represented physically as total microseconds (LongType).

    Spark's DayTimeIntervalType is awkward to aggregate/compare across
    engines; a µs integer is exact, orderable, and SQL-portable.
    """

    name = "duration"


class List(Dtype):
    __slots__ = ("inner",)
    name = "list"

    def __init__(self, inner: Dtype):
        self.inner = inner

    def __eq__(self, other):
        return type(other) is List and other.inner == self.inner

    def __hash__(self):
        return hash((List, self.inner))

    def __repr__(self):
        return f"list[{self.inner!r}]"


class NullType(Dtype):
    name = "null"


COMPARABLE = (Int, Float, String, Datetime, Date, Time, Duration, Bool)
NUMERIC = (Int, Float)


# --------------------------------------------------------------------------
# implicit conversion lattice (cost = (#conversions, #subtype-promotions))
# --------------------------------------------------------------------------

def converts_to(src: Dtype, dst: Dtype) -> bool:
    """Implicit conversion: src usable where dst expected."""
    if isinstance(src, NullType):
        return True
    if src == dst:
        return True
    # String family with max_length (reference tree/types.py:104-109):
    # any string converts to unbounded String(); a bounded target only
    # accepts a source whose bound is known and strictly tighter.
    if isinstance(src, String) and type(dst) is String:
        if dst.max_length is None:
            return True
        return (
            src.max_length is not None and dst.max_length > src.max_length
        )
    # concrete -> abstract family (Int64 -> Int, Float32 -> Float)
    if isinstance(src, type(dst)) and type(dst) in (Int, Float):
        return True
    if isinstance(src, Int) and isinstance(dst, (Float, Decimal)):
        return True
    if isinstance(src, Float) and type(dst) is Float:
        return True
    return False


def lca_type(a: Dtype, b: Dtype) -> Dtype:
    """Least common ancestor for case/when branches and union."""
    if isinstance(a, NullType):
        return b
    if isinstance(b, NullType):
        return a
    if a == b:
        return a
    if isinstance(a, Decimal) and isinstance(b, Decimal):
        scale = max(a.scale, b.scale)
        intd = max(a.precision - a.scale, b.precision - b.scale)
        return Decimal(min(38, intd + scale), scale)
    if a.is_int() and b.is_int():
        order = [Int8, Int16, Int32, Int64, Int]
        ai = order.index(type(a)) if type(a) in order else 4
        bi = order.index(type(b)) if type(b) in order else 4
        # unsigned widen
        if isinstance(a, (UInt8, UInt16, UInt32, UInt64)) or isinstance(
            b, (UInt8, UInt16, UInt32, UInt64)
        ):
            return Int64()
        return order[max(ai, bi)]()
    if a.is_numeric() and b.is_numeric():
        if isinstance(a, Decimal) or isinstance(b, Decimal):
            return Float64()
        if type(a) is Float32 and type(b) is Float32:
            return Float32()
        return Float64()
    if isinstance(a, String) and isinstance(b, String):
        return String()
    if isinstance(a, List) and isinstance(b, List):
        return List(lca_type(a.inner, b.inner))
    if {type(a), type(b)} == {Date, Datetime}:
        return Datetime()
    raise TypeError(f"no common supertype of {a!r} and {b!r}")


# --------------------------------------------------------------------------
# valid explicit casts (reference: tree/col_expr.py:2686-2722)
# --------------------------------------------------------------------------

def can_cast(src: Dtype, dst: Dtype) -> bool:
    if isinstance(src, NullType) or src == dst:
        return True
    if src.is_numeric() and (dst.is_numeric() or isinstance(dst, String)):
        return True
    if isinstance(src, String) and (
        dst.is_numeric()
        or isinstance(dst, (Datetime, Date, Time, Enum, String))
    ):
        return True
    if isinstance(src, Bool) and (dst.is_numeric() or isinstance(dst, String)):
        return True
    if isinstance(src, Datetime) and isinstance(dst, (Date, Time, String)):
        return True
    if isinstance(src, Time) and isinstance(dst, String):
        return True
    if isinstance(src, Date) and isinstance(dst, (Datetime, String)):
        return True
    if isinstance(src, Duration) and (dst.is_numeric() or isinstance(dst, String)):
        return True
    if isinstance(src, type(dst)) or isinstance(dst, type(src)):
        return True
    return False


# --------------------------------------------------------------------------
# Spark <-> pdt type mapping
# --------------------------------------------------------------------------

def to_spark_type(dtype: Dtype) -> T.DataType:
    if isinstance(dtype, Bool):
        return T.BooleanType()
    if isinstance(dtype, Decimal):
        return T.DecimalType(dtype.precision, dtype.scale)
    if isinstance(dtype, (UInt8, UInt16, UInt32, UInt64)):
        from .errors import warn_non_standard

        if isinstance(dtype, UInt64):
            # int64 is NOT a widening for uint64 — the top half of the
            # range has no representation
            warn_non_standard(
                "Spark has no unsigned integer types; UInt64 is mapped "
                "to signed int64 — values >= 2^63 overflow (use "
                "Decimal(20, 0) for the full uint64 range)"
            )
        else:
            warn_non_standard(
                f"Spark has no unsigned integer types; {dtype!r} is "
                f"widened to the next signed type "
                f"({dtype.spark.simpleString()})"
            )
        return dtype.spark
    if isinstance(dtype, (Int, Float)):
        return dtype.spark
    if isinstance(dtype, String):
        return T.StringType()
    if isinstance(dtype, Date):
        return T.DateType()
    if isinstance(dtype, Datetime):
        return T.TimestampType()
    if isinstance(dtype, (Time, Duration)):
        return T.LongType()
    if isinstance(dtype, List):
        return T.ArrayType(to_spark_type(dtype.inner))
    if isinstance(dtype, NullType):
        return T.NullType()
    raise TypeError(f"cannot map {dtype!r} to a Spark type")


def from_spark_type(st: T.DataType) -> Dtype:
    if isinstance(st, T.BooleanType):
        return Bool()
    if isinstance(st, T.ByteType):
        return Int8()
    if isinstance(st, T.ShortType):
        return Int16()
    if isinstance(st, T.IntegerType):
        return Int32()
    if isinstance(st, T.LongType):
        return Int64()
    if isinstance(st, T.FloatType):
        return Float32()
    if isinstance(st, T.DoubleType):
        return Float64()
    if isinstance(st, T.DecimalType):
        return Decimal(st.precision, st.scale)
    if isinstance(st, (T.VarcharType, T.CharType)):
        return String(st.length)
    if isinstance(st, T.StringType):
        return String()
    if isinstance(st, T.DateType):
        return Date()
    if isinstance(st, (T.TimestampType, T.TimestampNTZType)):
        return Datetime()
    if isinstance(st, T.DayTimeIntervalType):
        return Duration()
    if isinstance(st, T.ArrayType):
        return List(from_spark_type(st.elementType))
    if isinstance(st, T.NullType):
        return NullType()
    if isinstance(st, T.BinaryType):
        return String()  # opaque; multimodal columns carry their own metadata
    raise TypeError(f"unsupported Spark type {st}")


def infer_literal_type(val) -> Dtype:
    if val is None:
        return NullType()
    if isinstance(val, bool):
        return Bool()
    if isinstance(val, int):
        return Int64()
    if isinstance(val, float):
        return Float64()
    if isinstance(val, _PyDecimal):
        return Decimal()
    if isinstance(val, str):
        return String()
    if isinstance(val, _dt.datetime):
        return Datetime()
    if isinstance(val, _dt.date):
        return Date()
    if isinstance(val, _dt.time):
        return Time()
    if isinstance(val, _dt.timedelta):
        return Duration()
    if isinstance(val, (list, tuple)):
        if len(val) == 0:
            return List(NullType())
        return List(infer_literal_type(val[0]))
    raise TypeError(f"cannot infer pdt type of literal {val!r} ({type(val)})")
