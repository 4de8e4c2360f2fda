package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass XML escaping: & < > " ' -> entities.
  *
  * Output-identical to the reference's chained replaces
  * (/root/reference/src/main.rs:192-198, ampersand first) and to the
  * regexp_replace chain in StringFns — per-character mapping inserts no
  * characters that a later chain step would re-escape — but does one scan
  * instead of five regex passes. UTF-8 safe: the five escaped characters
  * are single-byte ASCII, and multi-byte sequences never contain ASCII
  * bytes, so a byte-level scan is correct.
  */
case class XmlEscape(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes
      : Seq[org.apache.spark.sql.types.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "xml_escape"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&apos;")
        case c => sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sb = ctx.freshName("sb")
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val ch = ctx.freshName("ch")
      s"""
         |String $str = $c.toString();
         |java.lang.StringBuilder $sb =
         |  new java.lang.StringBuilder($str.length() + 16);
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  char $ch = $str.charAt($i);
         |  switch ($ch) {
         |    case '&': $sb.append("&amp;"); break;
         |    case '<': $sb.append("&lt;"); break;
         |    case '>': $sb.append("&gt;"); break;
         |    case '"': $sb.append("&quot;"); break;
         |    case '\\'': $sb.append("&apos;"); break;
         |    default: $sb.append($ch);
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object XmlEscape {
  def apply(c: Column): Column =
    ColumnBridge.column(XmlEscape(ColumnBridge.expression(c)))
}
