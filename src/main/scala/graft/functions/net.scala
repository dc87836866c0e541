package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Network-type operators for the reference's IPADDR/CIDR/INET columns
  * (mapping.go:107-131 parses these qual types; SQLite itself treats them
  * as TEXT — we give them real semantics, like the postgres flavor does). */

private[functions] object Net {
  /** Dotted-quad IPv4 → unsigned int as Long, or null if malformed. */
  def ipToLong(s: String): java.lang.Long = {
    val parts = s.split('.')
    if (parts.length != 4) return null
    var acc = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i).toIntOption.getOrElse(return null)
      if (p < 0 || p > 255) return null
      acc = (acc << 8) | p
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
  /** (network, prefixLen) or null. */
  def parseCidr(s: String): (Long, Int) = {
    val slash = s.indexOf('/')
    if (slash < 0) return null
    val ip = ipToLong(s.substring(0, slash))
    if (ip == null) return null
    val len = s.substring(slash + 1).toIntOption.getOrElse(return null)
    if (len < 0 || len > 32) return null
    (ip.longValue(), len)
  }
}

/** ip_to_long('10.0.0.1') = 167772161. */
case class IpToLong(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "ip_to_long"
  override def nullSafeEval(input: Any): Any =
    Net.ipToLong(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): IpToLong = copy(c)
}

/** cidr_contains('10.0.0.0/9', ip) — prefix membership test. */
case class CidrContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cidr_contains"
  override def nullSafeEval(cidr: Any, ip: Any): Any = {
    val c = Net.parseCidr(cidr.asInstanceOf[UTF8String].toString)
    val ipl = Net.ipToLong(ip.asInstanceOf[UTF8String].toString)
    if (c == null || ipl == null) null
    else {
      val (net, len) = c
      val shift = 32 - len
      java.lang.Boolean.valueOf((ipl.longValue() >>> shift) == (net >>> shift))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CidrContains =
    copy(left = l, right = r)
}
