"""Catalog for the driver's TPC-H-ish testdata (/root/testdata/sf*).

These are external read-only parquet tables (``surrogate_id: false``), with
M2O relations declared on the natural keys so dotted-path joins work
exactly like the reference's FK paths (SURVEY.md §2.3).
"""

TPCH_SCHEMA = """
- table: region
  columns:
    r_regionkey: integer
    r_name: varchar
    nations: o2m nation.n_regionkey
  key: [r_regionkey]
  surrogate_id: false

- table: nation
  columns:
    n_nationkey: integer
    n_name: varchar
    n_regionkey: m2o region.r_regionkey
    customers: o2m customer.c_nationkey
    suppliers: o2m supplier.s_nationkey
  key: [n_nationkey]
  surrogate_id: false

- table: customer
  columns:
    c_custkey: bigint
    c_name: varchar
    c_nationkey: m2o nation.n_nationkey
    c_acctbal: float
    c_mktsegment: varchar
    orders: o2m orders.o_custkey
  key: [c_custkey]
  surrogate_id: false

- table: supplier
  columns:
    s_suppkey: bigint
    s_name: varchar
    s_nationkey: m2o nation.n_nationkey
    s_acctbal: float
  key: [s_suppkey]
  surrogate_id: false

- table: part
  columns:
    p_partkey: bigint
    p_name: varchar
    p_brand: varchar
    p_type: varchar
    p_size: integer
    p_retailprice: float
  key: [p_partkey]
  surrogate_id: false

- table: orders
  columns:
    o_orderkey: bigint
    o_custkey: m2o customer.c_custkey
    o_orderstatus: varchar
    o_totalprice: float
    o_orderdate: timestamptz
    o_orderpriority: varchar
    lineitems: o2m lineitem.l_orderkey
  key: [o_orderkey]
  surrogate_id: false

- table: lineitem
  columns:
    l_orderkey: m2o orders.o_orderkey
    l_partkey: m2o part.p_partkey
    l_suppkey: m2o supplier.s_suppkey
    l_linenumber: integer
    l_quantity: float
    l_extendedprice: float
    l_discount: float
    l_tax: float
    l_returnflag: varchar
    l_linestatus: varchar
    l_shipdate: timestamptz
  key: [l_orderkey, l_linenumber]
  surrogate_id: false

# events.ts is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark
# infers TIMESTAMP_NTZ, declared here as plain `timestamp` (NTZ).
- table: events
  columns:
    event_id: bigint
    ts: timestamp
    user_id: bigint
    event_type: varchar
    value: float
    props: jsonb
  key: [event_id]
  surrogate_id: false

- table: documents
  columns:
    doc_id: bigint
    text: varchar
    lang: varchar
    source: varchar
    n_chars: bigint
  key: [doc_id]
  surrogate_id: false

- table: embeddings
  columns:
    vec_id: bigint
    embedding: float[]
    label: integer
  key: [vec_id]
  surrogate_id: false
"""
