package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's output-range mini-DSL (etl_controller.py:73-125) as pure
  * Column combinators over built-in higher-order functions.
  */
object RangeDsl {

  /** OP-11 — parse `"1,3,5-10,20-15"` → array<int>, order-preserving.
    * Supports descending ranges (`20-15` → 20..15) and silently drops
    * malformed parts, exactly like the reference (etl_controller.py:73-99).
    */
  def parseRangeDsl(s: Column): Column = {
    val parts = transform(split(s, ","), p => trim(p))
    val expanded = transform(parts, p => {
      val isRange  = p.rlike("^[0-9]+\\s*-\\s*[0-9]+$")
      val isSingle = p.rlike("^[0-9]+$")
      val a = regexp_extract(p, "^([0-9]+)\\s*-\\s*([0-9]+)$", 1).cast("int")
      val b = regexp_extract(p, "^([0-9]+)\\s*-\\s*([0-9]+)$", 2).cast("int")
      when(isRange, sequence(a, b, when(a <= b, 1).otherwise(-1)))
        .when(isSingle, array(p.cast("int")))
        .otherwise(array().cast("array<int>"))
    })
    flatten(expanded)
  }

  /** OP-12 — format an int array back to the compact string, collapsing
    * only consecutive *ascending* runs and preserving order — no sort
    * (etl_controller.py:102-125): [1,2,3,7] → "1-3, 7"; [20,19] → "20, 19".
    *
    * Implemented as a single left fold (built-in `aggregate`) carrying
    * (finished segments, current run lo, previous value).
    */
  def formatRangeDsl(arr: Column): Column = {
    def seg(lo: Column, hi: Column): Column =
      when(lo === hi, lo.cast("string"))
        .otherwise(concat(lo.cast("string"), lit("-"), hi.cast("string")))
    val init = struct(
      array().cast("array<string>").as("segs"),
      lit(null).cast("int").as("lo"),
      lit(null).cast("int").as("prev"))
    aggregate(
      arr,
      init,
      (acc, x) => {
        val segs = acc.getField("segs")
        val lo   = acc.getField("lo")
        val prev = acc.getField("prev")
        when(prev.isNull,
            struct(segs.as("segs"), x.as("lo"), x.as("prev")))
          .when(x === prev + 1,
            struct(segs.as("segs"), lo.as("lo"), x.as("prev")))
          .otherwise(
            struct(concat(segs, array(seg(lo, prev))).as("segs"),
              x.as("lo"), x.as("prev")))
      },
      acc => {
        val segs = acc.getField("segs")
        val lo   = acc.getField("lo")
        val prev = acc.getField("prev")
        array_join(
          when(prev.isNull, segs)
            .otherwise(concat(segs, array(seg(lo, prev)))),
          ", ")
      })
  }
}
