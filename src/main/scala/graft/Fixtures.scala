package graft

/** Schema-tree fixtures mapping the reference's relationship topologies
  * (FIXTURES.md §A) onto the driver test data (§B). Each is a node-tree JSON
  * in the reference's schema format (`pgsync/node.py`, examples at
  * `examples/book/schema.json`).
  */
object Fixtures {

  /** Flagship: root + one_to_many/object child + one_to_one/object child —
    * the orders→lineitem / orders→customer analogue of book→book_language /
    * book→publisher.
    */
  val flagship: String =
    """{
      "table": "orders",
      "columns": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
      "children": [
        {"table": "lineitem", "label": "lineitems",
         "columns": ["l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"],
         "relationship": {"type": "one_to_many", "variant": "object"}},
        {"table": "customer", "label": "customer",
         "columns": ["c_name", "c_mktsegment"],
         "relationship": {"type": "one_to_one", "variant": "object"}}
      ]
    }"""

  /** one_to_one chain: customer → nation → region (author→city→country
    * analogue, FIXTURES.md §A topology 2/3).
    */
  val oneToOneChain: String =
    """{
      "table": "customer",
      "columns": ["c_custkey", "c_name"],
      "children": [
        {"table": "nation", "label": "nation", "columns": ["n_name"],
         "relationship": {"type": "one_to_one", "variant": "object"},
         "children": [
           {"table": "region", "label": "region", "columns": ["r_name"],
            "relationship": {"type": "one_to_one", "variant": "object"}}
         ]}
      ]
    }"""

  /** many_to_many through: part ↔ supplier through lineitem
    * (book↔author through book_author analogue, topology 5).
    */
  val through: String =
    """{
      "table": "part",
      "columns": ["p_partkey", "p_name"],
      "children": [
        {"table": "supplier", "label": "suppliers",
         "columns": ["s_suppkey", "s_name"],
         "relationship": {"type": "one_to_many", "variant": "object",
                          "through_tables": ["lineitem"]}}
      ]
    }"""

  /** one_to_many/scalar: orders → bare l_partkey array (book→language.code
    * analogue, topology 6).
    */
  val scalarArray: String =
    """{
      "table": "orders",
      "columns": ["o_orderkey"],
      "children": [
        {"table": "lineitem", "label": "partkeys", "columns": ["l_partkey"],
         "relationship": {"type": "one_to_many", "variant": "scalar"}}
      ]
    }"""

  /** Deep nesting: one_to_many child that itself has a one_to_one child
    * (book→authors→city analogue, FIXTURES.md topology 5).
    */
  val nested: String =
    """{
      "table": "orders",
      "columns": ["o_orderkey", "o_orderstatus"],
      "children": [
        {"table": "lineitem", "label": "lineitems",
         "columns": ["l_linenumber", "l_quantity"],
         "relationship": {"type": "one_to_many", "variant": "object"},
         "children": [
           {"table": "part", "label": "part", "columns": ["p_name", "p_brand"],
            "relationship": {"type": "one_to_one", "variant": "object"}}
         ]}
      ]
    }"""

  /** one_to_one scalar variant: bare customer name on the order doc. */
  val scalarOne: String =
    """{
      "table": "orders",
      "columns": ["o_orderkey"],
      "children": [
        {"table": "customer", "label": "customer_name", "columns": ["c_name"],
         "relationship": {"type": "one_to_one", "variant": "scalar"}}
      ]
    }"""

  /** Root-only with transforms (replace → rename → concat,
    * `pgsync/transform.py:211-216`) — topology 1 + §A topology 8.
    */
  val transforms: String =
    """{
      "table": "orders",
      "columns": ["o_orderkey", "o_orderstatus", "o_orderpriority"],
      "transform": {
        "replace": {"o_orderstatus": {"O": "X"}},
        "rename": {"o_orderkey": "order_id"},
        "concat": {"columns": ["order_id", "o_orderstatus"],
                   "destination": "order_tag", "delimiter": "-"}
      }
    }"""

  /** JSON-path projection on root (doc->k analogue, topology 7):
    * `props->k` projects `$.k` with alias `props_k` (`pgsync/node.py:200-303`).
    */
  val jsonPath: String =
    """{
      "table": "events",
      "columns": ["event_id", "event_type", "props->k"]
    }"""

  /** Composite-PK root: lineitem `_id` = `l_orderkey|l_linenumber`
    * (`pgsync/sync.py:527-535`).
    */
  val compositePk: String =
    """{
      "table": "lineitem",
      "columns": ["l_orderkey", "l_linenumber", "l_quantity"]
    }"""
}
