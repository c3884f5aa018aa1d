"""Explicit Arrow schemas + schema-evolution (unify / promote / align) rules.

Reference analogue: fixed Iceberg ``Schema`` declarations
(`radiant/tasks/vcf/snv/germline/occurrence.py:11-68`), append-only column
migrations (`radiant/dags/sql/radiant/migrations/...`) and
``merge_schemas`` (`radiant/tasks/iceberg/utils.py:38-43`). Our engine
handles add / widen / drop at the merge stage via Arrow schema unification
(north rule: "schema evolution handled by Arrow schema unification").
"""

from __future__ import annotations

import base64

import pyarrow as pa

#: the changelog event schema (FIXTURES.md §2); batches may deviate by
#: added / widened / dropped columns — unified at apply time.
CHANGELOG_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

#: internal columns the engine appends to snapshot rows. ``deleted`` rows are
#: retained tombstones: a delete must stay visible to the LWW merge so a
#: late-arriving out-of-order event (older ``(warc_ts, lsn)``) loses to it
#: instead of resurrecting the url — the analogue of the reference's
#: ``deleted`` flag on staging rows
#: (`radiant/dags/sql/radiant/init/staging_sequencing_experiment_create_table.sql:24`,
#: `sequencing_experiment_update_deleted.sql:1-4`). User-facing reads filter
#: them out.
INTERNAL_FIELDS = [
    pa.field("doc_id", pa.int64()),
    pa.field("part", pa.int32()),
    pa.field("lsn", pa.int64()),
    pa.field("deleted", pa.bool_()),
]

_INT_ORDER = {
    pa.int8(): 0,
    pa.int16(): 1,
    pa.int32(): 2,
    pa.int64(): 3,
}
_UINT_ORDER = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
_FLOAT_ORDER = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}


def promote(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Widen-only type promotion (int32→int64, float32→float64, ...).

    Raises on genuinely incompatible types — schema evolution here is
    append/widen/drop, never rewrite (matches the reference's append-only
    migration discipline).
    """
    if a.equals(b):
        return a
    for order in (_INT_ORDER, _UINT_ORDER, _FLOAT_ORDER):
        if a in order and b in order:
            return a if order[a] >= order[b] else b
    if (a in _INT_ORDER or a in _UINT_ORDER) and b in _FLOAT_ORDER:
        return b
    if (b in _INT_ORDER or b in _UINT_ORDER) and a in _FLOAT_ORDER:
        return a
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        return pa.timestamp("us")
    if pa.types.is_string(a) and pa.types.is_large_string(b):
        return b
    if pa.types.is_large_string(a) and pa.types.is_string(b):
        return a
    if pa.types.is_binary(a) and pa.types.is_large_binary(b):
        return b
    if pa.types.is_large_binary(a) and pa.types.is_binary(b):
        return a
    # nested types evolve recursively (reference analogue: struct/list
    # evolution in `radiant/tasks/vcf/snv/consequence.py:40-48` exon struct
    # and `radiant/tasks/iceberg/utils.py:38-43` merge_schemas)
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(promote(a.value_type, b.value_type))
    if pa.types.is_large_list(a) and pa.types.is_large_list(b):
        return pa.large_list(promote(a.value_type, b.value_type))
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        # field order from a; b's new fields append; shared fields widen
        names: list[str] = []
        types: dict[str, pa.DataType] = {}
        for st in (a, b):
            for i in range(st.num_fields):
                f = st.field(i)
                if f.name not in types:
                    names.append(f.name)
                    types[f.name] = f.type
                else:
                    types[f.name] = promote(types[f.name], f.type)
        return pa.struct([pa.field(n, types[n]) for n in names])
    raise TypeError(f"cannot promote {a} vs {b}")


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Field-order-preserving unification with widen-only promotion.

    First schema's field order wins; new fields append in encounter order.
    A field missing from a later schema is retained (drop ⇒ nulls for new
    rows, column kept in the snapshot — FIXTURES.md §3).
    """
    names: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                names.append(f.name)
                types[f.name] = f.type
            else:
                types[f.name] = promote(types[f.name], f.type)
    return pa.schema([pa.field(n, types[n]) for n in names])


def align_array(col: pa.Array | pa.ChunkedArray, typ: pa.DataType) -> pa.Array:
    """Recursively align an array to ``typ``: struct columns gain missing
    subfields as nulls and widen shared ones (a plain ``cast`` refuses
    structs with added fields); list value types widen in place; scalars
    cast. Null slots are preserved at every level."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.type.equals(typ):
        return col
    if pa.types.is_struct(typ) and pa.types.is_struct(col.type):
        children = []
        for i in range(typ.num_fields):
            sub = typ.field(i)
            if col.type.get_field_index(sub.name) >= 0:
                children.append(align_array(col.field(sub.name), sub.type))
            else:
                children.append(pa.nulls(len(col), type=sub.type))
        return pa.StructArray.from_arrays(
            children,
            fields=[typ.field(i) for i in range(typ.num_fields)],
            mask=pc.is_null(col),
        )
    if (
        pa.types.is_list(typ) or pa.types.is_large_list(typ)
    ) and (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
        try:
            return col.cast(typ)
        except (
            pa.ArrowInvalid,
            pa.ArrowNotImplementedError,
            pa.ArrowTypeError,
        ):
            # e.g. list<struct> with added subfields — rebuild from parts
            values = align_array(col.values, typ.value_type)
            cls = (
                pa.LargeListArray
                if pa.types.is_large_list(typ)
                else pa.ListArray
            )
            return cls.from_arrays(
                col.offsets, values, mask=pc.is_null(col)
            )
    return col.cast(typ)


def align_table(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast/pad a table to ``schema``: missing columns become typed nulls,
    present columns are cast/aligned (widen; recursive for struct/list),
    extra columns are dropped, order fixed.
    """
    n = t.num_rows
    cols = []
    for f in schema:
        if f.name in t.column_names:
            col = t.column(f.name)
            if not col.type.equals(f.type):
                col = align_array(col, f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def schema_summary(schema: pa.Schema) -> list[list[str]]:
    """Human-readable [name, type] pairs for the manifest JSON."""
    return [[f.name, str(f.type)] for f in schema]
