"""Component model: typed record schemas compiled to Spark StructType.

Reference: components are pydantic LanceModel subclasses whose fields
become Arrow columns (archetype/core/interfaces.py:6-7, schema
assembly store.py:77-92). Here components are plain dataclasses and
the compiler targets pyspark.sql.types — same capability surface
(primitives, lists, optionals, timestamps, nested structs) without a
pydantic dependency.

Flattening rule (parity with store.py:71-74): every component field
becomes a top-level column named `<classname_lowercase>__<field>`.
"""

from __future__ import annotations

import dataclasses
import datetime
import types
import typing
from typing import Any, Union, get_args, get_origin

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class Component:
    """Base marker for component records. Subclass as a dataclass:

        @dataclass
        class Position(Component):
            x: float
            y: float
    """

    def __init_subclass__(cls, **kw: Any) -> None:
        super().__init_subclass__(**kw)


def _spark_type(py_type: Any) -> tuple[DataType, bool]:
    """Python annotation -> (Spark type, nullable). Mirrors the
    pydantic->Arrow surface the reference relies on (store.py:81-83)."""
    origin = get_origin(py_type)
    if origin is Union or (origin is not None and origin is types.UnionType):
        args = [a for a in get_args(py_type) if a is not type(None)]
        if len(args) != 1:
            raise TypeError(f"unsupported union type {py_type!r}")
        inner, _ = _spark_type(args[0])
        return inner, True
    if origin in (list, typing.List):
        (elem,) = get_args(py_type)
        elem_t, elem_null = _spark_type(elem)
        return ArrayType(elem_t, containsNull=elem_null), False
    if dataclasses.is_dataclass(py_type):
        return _struct_of(py_type), False
    mapping: dict[Any, DataType] = {
        float: DoubleType(),
        int: LongType(),
        str: StringType(),
        bool: BooleanType(),
        bytes: BinaryType(),
        datetime.datetime: TimestampType(),
    }
    if py_type in mapping:
        return mapping[py_type], False
    raise TypeError(f"unsupported component field type {py_type!r}")


def _struct_of(cls: type) -> StructType:
    fields = []
    for f in dataclasses.fields(cls):
        t, nullable = _spark_type(f.type if not isinstance(f.type, str) else _resolve(cls, f.name))
        fields.append(StructField(f.name, t, nullable))
    return StructType(fields)


def _resolve(cls: type, field_name: str) -> Any:
    """Resolve string annotations (from __future__ annotations)."""
    hints = typing.get_type_hints(cls)
    return hints[field_name]


def component_prefix(component_type: type) -> str:
    """`<classname_lowercase>__` — parity with store.py:71-74."""
    return component_type.__name__.lower() + "__"


def component_schema(component_type: type) -> StructType:
    """Flattened, prefixed StructType for one component."""
    if not dataclasses.is_dataclass(component_type):
        raise TypeError(
            f"{component_type.__name__} must be a @dataclass Component subclass"
        )
    prefix = component_prefix(component_type)
    hints = typing.get_type_hints(component_type)
    out = []
    for f in dataclasses.fields(component_type):
        t, nullable = _spark_type(hints[f.name])
        out.append(StructField(prefix + f.name, t, nullable))
    return StructType(out)


def flatten_component(instance: Component) -> dict[str, Any]:
    """Component instance -> prefixed column dict (store.py:144-150)."""
    prefix = component_prefix(type(instance))
    return {
        prefix + f.name: getattr(instance, f.name)
        for f in dataclasses.fields(instance)
    }


def signature_of(component_types: typing.Iterable[type]) -> tuple[type, ...]:
    """Sorted-by-class-name signature tuple (store.py:55-60)."""
    return tuple(sorted(component_types, key=lambda t: t.__name__))
