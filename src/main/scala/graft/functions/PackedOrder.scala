package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.LongType

/** Deterministic tie-breaking for max_by/min_by: fold (ordering value,
  * unique key) into ONE orderable long — value in the high bits, key in the
  * low 32 — because neither Spark's max_by nor DuckDB's arg_max defines tie
  * order, and an oracle-matched operator needs the same rule on both
  * engines.
  *
  * DOMAIN BOUND (the trap if this is copied casually): the packing is only
  * order-correct while `0 <= value < 2^31` and `0 <= key < 2^32` — beyond
  * that the product overflows Long or the key bleeds into the value bits,
  * and ordering silently breaks. Where DuckDB parity is not required,
  * prefer `struct(value, key)` as the ordering argument instead: max_by
  * accepts any orderable type and structs have no domain bound. The packed
  * form exists solely because DuckDB's arg_max cannot order on a struct
  * the same way.
  */
object PackedOrder {
  def pack(value: Column, key: Column): Column =
    value.cast(LongType) * lit(1L << 32) + key
}
