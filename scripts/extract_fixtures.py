#!/usr/bin/env python3
"""Extract the reference's live Navicat dump rows into parquet fixtures for
ScalaTest golden tests (run once; output committed under
src/test/resources/fixtures/).

Sources (read-only): /root/reference/sql_script/db_staging.sql
  - products_general   (239 raw rows,      :4372 ff.)
  - products_transform (239 cleaned rows,  :4636 ff.)
  - products_expired   (239 SCD2 rows,     :4111 ff.)
  - dim_date           (4018 calendar rows, :51 ff.)
"""
import re
import sys

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def to_us_ts(series):
    """Parse 'YYYY-mm-dd HH:MM:SS' strings to a pyarrow us-precision
    timestamp array (pandas ns timestamps can't hold the 9999-12-31
    sentinel)."""
    pydt = [None if v is None else dt.datetime.strptime(v, "%Y-%m-%d %H:%M:%S")
            for v in series]
    return pa.array(pydt, type=pa.timestamp("us"))


def write_parquet(df, ts_cols, path):
    tbl = pa.Table.from_pandas(df.drop(columns=ts_cols), preserve_index=False)
    for c in ts_cols:
        tbl = tbl.append_column(c, to_us_ts(df[c]))
    pq.write_table(tbl, path)


def parse_values(tuple_body: str):
    """Parse one SQL VALUES(...) tuple body into python values (handles
    MySQL single-quote strings with backslash escapes and '' doubling)."""
    vals, i, n = [], 0, len(tuple_body)
    while i < n:
        c = tuple_body[i]
        if c in " ,":
            i += 1
            continue
        if c == "'":
            i += 1
            buf = []
            while i < n:
                c = tuple_body[i]
                if c == "\\" and i + 1 < n:
                    nxt = tuple_body[i + 1]
                    buf.append({"n": "\n", "r": "\r", "t": "\t", "0": "\0"}.get(nxt, nxt))
                    i += 2
                elif c == "'":
                    if i + 1 < n and tuple_body[i + 1] == "'":
                        buf.append("'")
                        i += 2
                    else:
                        i += 1
                        break
                else:
                    buf.append(c)
                    i += 1
            vals.append("".join(buf))
        else:
            j = i
            while j < n and tuple_body[j] not in ",":
                j += 1
            tok = tuple_body[i:j].strip()
            vals.append(None if tok.upper() == "NULL" else tok)
            i = j
    return vals


def extract(sql_text, table):
    rows = []
    for m in re.finditer(
            r"INSERT INTO `%s`(?:\s*\([^)]*\))? VALUES \((.*?)\);\n" % table,
            sql_text, re.S):
        rows.append(parse_values(m.group(1)))
    return rows


def main():
    txt = open("/root/reference/sql_script/db_staging.sql", encoding="utf-8").read()
    out = "src/test/resources/fixtures"
    import os
    os.makedirs(out, exist_ok=True)

    gen_cols = ["ID", "TEN", "LINK", "LINK_ANH", "GIA_CU", "GIA_MOI",
                "KICH_THUOC_MAN_HINH", "RAM", "BO_NHO", "NGAY", "ID_CONFIG"]
    gen = pd.DataFrame(extract(txt, "products_general"), columns=gen_cols)
    gen["ID"] = gen["ID"].astype("int32")
    gen["ID_CONFIG"] = gen["ID_CONFIG"].astype("int32")
    write_parquet(gen, ["NGAY"], f"{out}/products_general.parquet")

    tr_cols = ["ID_SR", "ID", "TEN", "LINK", "LINK_ANH", "GIA_CU", "GIA_MOI",
               "KICH_THUOC_MAN_HINH", "RAM", "BO_NHO", "SK_DATE", "NGAY", "ID_CONFIG"]
    tr = pd.DataFrame(extract(txt, "products_transform"), columns=tr_cols)
    for c, t in [("ID_SR", "int32"), ("ID", "int32"), ("RAM", "int32"),
                 ("BO_NHO", "int32"), ("SK_DATE", "int32"), ("ID_CONFIG", "int32")]:
        tr[c] = tr[c].astype(t)
    for c in ["GIA_CU", "GIA_MOI", "KICH_THUOC_MAN_HINH"]:
        tr[c] = tr[c].astype("float64")
    write_parquet(tr, ["NGAY"], f"{out}/products_transform.parquet")

    ex_cols = ["ID_SR", "ID", "TEN", "LINK", "LINK_ANH", "GIA_CU", "GIA_MOI",
               "KICH_THUOC_MAN_HINH", "RAM", "BO_NHO", "SK_DATE", "NGAY",
               "CREATED_AT", "UPDATED_AT", "EXPIRED_AT", "ID_CONFIG"]
    ex = pd.DataFrame(extract(txt, "products_expired"), columns=ex_cols)
    for c, t in [("ID_SR", "int32"), ("ID", "int32"), ("RAM", "int32"),
                 ("BO_NHO", "int32"), ("SK_DATE", "int32"), ("ID_CONFIG", "int32")]:
        ex[c] = ex[c].astype(t)
    for c in ["GIA_CU", "GIA_MOI", "KICH_THUOC_MAN_HINH"]:
        ex[c] = ex[c].astype("float64")
    write_parquet(ex, ["NGAY", "CREATED_AT", "UPDATED_AT", "EXPIRED_AT"],
                  f"{out}/products_expired.parquet")

    dd_cols = ["DATE_SK", "FULL_DATE", "INT_DAY", "INT_MONTH", "DAY_OF_WEEK",
               "CALENDAR_MONTH", "CALENDAR_YEAR", "CALENDAR_YEAR_MONTH",
               "DATE_OF_MONTH", "DAY_OF_YEAR", "SUN_WEEK_OF_YEAR", "SUN_YEAR_WEEK",
               "SUN_WEEK", "MON_WEEK_OF_YEAR", "MON_YEAR_WEEK", "MON_WEEK",
               "QUARTER", "QUARTER_OF_YEAR", "HOLIDAY", "DAY_TYPE"]
    dd = pd.DataFrame(extract(txt, "dim_date"), columns=dd_cols)
    for c in ["DATE_SK", "INT_DAY", "INT_MONTH", "CALENDAR_YEAR", "DATE_OF_MONTH",
              "DAY_OF_YEAR", "SUN_WEEK_OF_YEAR", "MON_WEEK_OF_YEAR"]:
        dd[c] = dd[c].astype("int32")
    for c in ["FULL_DATE", "SUN_WEEK", "MON_WEEK", "QUARTER_OF_YEAR"]:
        dd[c] = pd.to_datetime(dd[c]).dt.date
    dd.to_parquet(f"{out}/dim_date.parquet", index=False)

    print("general", len(gen), "| transform", len(tr), "| expired", len(ex),
          "| dim_date", len(dd))
    assert len(gen) == 239 and len(tr) == 239 and len(ex) == 239 and len(dd) == 4018, \
        "unexpected fixture row counts"


if __name__ == "__main__":
    sys.exit(main())
