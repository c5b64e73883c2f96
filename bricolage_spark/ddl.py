"""``.ct`` CREATE TABLE file translation (SURVEY.md §1.2/§1.3).

The reference executes user ``.ct`` DDL verbatim on Redshift
(jobclass/create.rb:15-24, test/home/subsys/*.ct). Redshift physical
attributes (``encode lzo/delta``, ``distkey``, ``sortkey``) are *hints*:
here they map to Spark write options (repartition/sortWithinPartitions)
and the logical column list maps to a StructType.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

from bricolage_spark.exception import ParameterError

_TYPE_MAP: list[tuple[re.Pattern, object]] = [
    (re.compile(r"\Asmallint\Z|\Aint2\Z", re.I), T.ShortType()),
    (re.compile(r"\A(?:integer|int|int4)\Z", re.I), T.IntegerType()),
    (re.compile(r"\A(?:bigint|int8)\Z", re.I), T.LongType()),
    (re.compile(r"\A(?:real|float4)\Z", re.I), T.FloatType()),
    (re.compile(r"\A(?:double(?:\s+precision)?|float8?|float)\Z", re.I), T.DoubleType()),
    (re.compile(r"\Aboolean\Z|\Abool\Z", re.I), T.BooleanType()),
    (re.compile(r"\Adate\Z", re.I), T.DateType()),
    (re.compile(r"\Atimestamp(?:\s+without\s+time\s+zone)?\Z", re.I), T.TimestampType()),
    (re.compile(r"\A(?:varchar|character\s+varying|char|character|text)\s*(?:\(\s*\d+\s*\))?\Z", re.I), T.StringType()),
]
_DECIMAL_RE = re.compile(r"\A(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\Z", re.I)


def map_type(sql_type: str) -> T.DataType:
    sql_type = sql_type.strip()
    m = _DECIMAL_RE.match(sql_type)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    for pat, t in _TYPE_MAP:
        if pat.match(sql_type):
            return t
    raise ParameterError(f"unsupported column type: {sql_type!r}")


@dataclass
class TableDef:
    table: str
    schema: T.StructType
    distkey: str | None = None
    sortkeys: list[str] = field(default_factory=list)
    encodes: dict[str, str] = field(default_factory=dict)  # recorded, unused


def parse_ct(ddl_text: str) -> TableDef:
    """Parse a ``.ct`` file (one CREATE TABLE statement).

    Grammar actually used by the reference fixtures
    (test/home/subsys/users.ct etc.):

        create table NAME
        ( col TYPE [encode X] [not null] [,...]
        )
        [distkey(col)] [sortkey(col, ...)] ;
    """
    text = re.sub(r"--.*", "", ddl_text)
    m = re.search(
        r"create\s+table\s+(?:if\s+not\s+exists\s+)?([\w.$]+)\s*\(",
        text,
        re.I,
    )
    if not m:
        raise ParameterError("cannot parse .ct DDL: no CREATE TABLE found")
    name = m.group(1)
    # find the matching close paren of the column list (attribute clauses
    # like distkey(id) follow it, so a greedy regex would overrun)
    depth, start, end = 1, m.end(), None
    for i in range(m.end(), len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end is None:
        raise ParameterError("cannot parse .ct DDL: unbalanced parens")
    cols_text, tail = text[start:end], text[end + 1 :]

    fields: list[T.StructField] = []
    encodes: dict[str, str] = {}
    for raw in _split_columns(cols_text):
        col = raw.strip()
        if not col:
            continue
        cm = re.match(r"(\w+)\s+(.+?)\s*\Z", col, re.S)
        if not cm:
            raise ParameterError(f"cannot parse column def: {col!r}")
        cname, rest = cm.group(1), cm.group(2)
        enc = re.search(r"\bencode\s+(\w+)", rest, re.I)
        if enc:
            encodes[cname] = enc.group(1).lower()
            rest = re.sub(r"\bencode\s+\w+", "", rest, flags=re.I)
        nullable = True
        if re.search(r"\bnot\s+null\b", rest, re.I):
            nullable = False
            rest = re.sub(r"\bnot\s+null\b", "", rest, flags=re.I)
        rest = re.sub(r"\bprimary\s+key\b|\bunique\b", "", rest, flags=re.I).strip()
        fields.append(T.StructField(cname, map_type(rest), nullable))

    dk = re.search(r"\bdistkey\s*\(\s*(\w+)\s*\)", tail, re.I)
    sk = re.search(r"\bsortkey\s*\(\s*([\w\s,]+)\s*\)", tail, re.I)
    return TableDef(
        table=name,
        schema=T.StructType(fields),
        distkey=dk.group(1) if dk else None,
        sortkeys=[c.strip() for c in sk.group(1).split(",")] if sk else [],
        encodes=encodes,
    )


def _split_columns(cols_text: str) -> list[str]:
    """Split on commas not inside parentheses (decimal(10,2))."""
    out, buf, depth = [], [], 0
    for ch in cols_text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out
