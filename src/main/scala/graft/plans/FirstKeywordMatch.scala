package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered multi-keyword classifier as one expression: returns the label of
  * the FIRST keyword list containing any substring match, else the
  * fallback — exactly the reference's `get_category` description branch
  * (`etl_pipeline/etl.py:206-224`), whose semantics the composed
  * `when(contains || …)` chain also implements.
  *
  * Why a custom expression: the composed chain evaluates ~45 independent
  * `Contains` nodes per row and re-boxes the input for each; this kernel
  * makes one pass over the precomputed UTF8 keyword table with early exit,
  * in both codegen and interpreted form. Byte-level `UTF8String.contains`
  * matches SQL `LIKE '%kw%'` for these ASCII keywords, so oracle semantics
  * are unchanged (differential-tested against the composed chain).
  */
case class FirstKeywordMatch(
    child: Expression,
    lists: Seq[Seq[String]],
    labels: Seq[String],
    fallback: String) extends UnaryExpression {

  require(lists.size == labels.size)

  override def dataType: DataType = StringType

  @transient private lazy val kwTable: Array[Array[UTF8String]] =
    lists.map(_.map(UTF8String.fromString).toArray).toArray
  @transient private lazy val labelTable: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray
  @transient private lazy val fallbackU: UTF8String = UTF8String.fromString(fallback)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var i = 0
    while (i < kwTable.length) {
      val kws = kwTable(i)
      var j = 0
      while (j < kws.length) {
        if (s.contains(kws(j))) return labelTable(i)
        j += 1
      }
      i += 1
    }
    fallbackU
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kwRef = ctx.addReferenceObj("kwTable", kwTable, "org.apache.spark.unsafe.types.UTF8String[][]")
    val labelRef = ctx.addReferenceObj("labelTable", labelTable, "org.apache.spark.unsafe.types.UTF8String[]")
    val fbRef = ctx.addReferenceObj("fallbackU", fallbackU, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val found = ctx.freshName("found")
      s"""
         |${ev.value} = $fbRef;
         |$found:
         |for (int $i = 0; $i < $kwRef.length; $i++) {
         |  for (int $j = 0; $j < $kwRef[$i].length; $j++) {
         |    if ($s.contains($kwRef[$i][$j])) {
         |      ${ev.value} = $labelRef[$i];
         |      break $found;
         |    }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FirstKeywordMatch {
  def first_keyword_match(c: Column, lists: Seq[Seq[String]], labels: Seq[String],
      fallback: String): Column =
    ColumnBridge.column(FirstKeywordMatch(ColumnBridge.expression(c), lists, labels, fallback))
}
