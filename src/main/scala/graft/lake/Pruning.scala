package graft.lake

import scala.util.Try

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File skipping: decide from partition values + footer min/max
  * whether a file can possibly contain rows matching a predicate.
  * Conservative — returns "keep" whenever it can't prove exclusion,
  * so correctness never depends on it; Spark re-applies the full
  * predicate after the scan. This is the planner-side pruning that
  * makes selective queries touch a fraction of a 100 TB table
  * (reference docs/02-lab-optimizations.md:314-341 partition pruning +
  * :591-599 stats-based skipping).
  */
object Pruning {

  def prune(files: Seq[AddFile], schema: StructType,
            partitionCols: Seq[String], predicate: Column): Seq[AddFile] = {
    val conjuncts = splitConjuncts(normalize(GraftExpr.expression(predicate)))
    files.filter(f => conjuncts.forall(c => mayMatch(f, partitionCols, c)))
  }

  /** Top-level equality bindings `attr = literal` in the predicate's
    * conjuncts — the shapes bloom-filter skipping can consume.
    */
  def equalityBindings(predicate: Column): Seq[(String, Any)] =
    splitConjuncts(normalize(GraftExpr.expression(predicate))).flatMap {
      case EqualTo(l, r) =>
        (attrName(l), litValue(r), attrName(r), litValue(l)) match {
          case (Some(n), Some((v, _)), _, _) => Some(n -> v)
          case (_, _, Some(n), Some((v, _))) => Some(n -> v)
          case _ => None
        }
      case _ => None
    }

  /** Top-level `attr IN (literals…)` conjuncts: (attr, candidate
    * values) — a file survives bloom pruning if ANY value might be in
    * it.
    */
  def inBindings(predicate: Column): Seq[(String, Seq[Any])] =
    splitConjuncts(normalize(GraftExpr.expression(predicate))).flatMap {
      case In(a, list) if list.forall(_.foldable) =>
        attrName(a).map { n =>
          n -> list.flatMap(litValue(_).map(_._1))
        }
      case _ => None
    }

  /** The Spark 4 Column→Expression converter leaves comparison
    * operators as `UnresolvedFunction("=", ...)` nodes (the analyzer
    * usually resolves them); rewrite the shapes pruning understands
    * into concrete Catalyst operators.
    */
  private def normalize(e: Expression): Expression = e match {
    case f: UnresolvedFunction =>
      val args = f.arguments.map(normalize)
      (f.nameParts.last.toLowerCase, args) match {
        case ("and", Seq(l, r)) => And(l, r)
        case ("or", Seq(l, r)) => Or(l, r)
        case ("=" | "==", Seq(l, r)) => EqualTo(l, r)
        case ("<", Seq(l, r)) => LessThan(l, r)
        case ("<=", Seq(l, r)) => LessThanOrEqual(l, r)
        case (">", Seq(l, r)) => GreaterThan(l, r)
        case (">=", Seq(l, r)) => GreaterThanOrEqual(l, r)
        case ("in", l +: rest) if rest.nonEmpty => In(l, rest)
        case ("startswith", Seq(l, r)) => StartsWith(l, r)
        case ("isnull", Seq(x)) => IsNull(x)
        case ("isnotnull", Seq(x)) => IsNotNull(x)
        case _ => e
      }
    case And(l, r) => And(normalize(l), normalize(r))
    case Or(l, r) => Or(normalize(l), normalize(r))
    case other => other
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Fold a (possibly Cast-wrapped) literal-valued expression.
    * Casts of string literals to timestamp need a timezone to eval —
    * pin UTC (the engine-wide session timezone).
    */
  private def litValue(e: Expression): Option[(Any, DataType)] = e match {
    case Literal(v, t) if v != null => Some((v, t))
    case c: Cast if c.foldable =>
      val cz = if (c.timeZoneId.isEmpty) c.withTimeZone("UTC") else c
      Try((cz.eval(), c.dataType)).toOption.filter(_._1 != null)
    case _ => None
  }

  /** Compare a stored stat string against a literal of type `t`.
    * None when incomparable (unknown type → keep file).
    */
  private def cmp(stored: String, lit: Any, t: DataType): Option[Int] = Try {
    t match {
      case ByteType | ShortType | IntegerType | LongType =>
        stored.toLong.compare(lit.asInstanceOf[Number].longValue())
      case FloatType | DoubleType =>
        stored.toDouble.compare(lit.asInstanceOf[Number].doubleValue())
      case _: DecimalType =>
        BigDecimal(stored).compare(lit.asInstanceOf[Decimal].toBigDecimal)
      case StringType =>
        stored.compareTo(lit.asInstanceOf[UTF8String].toString)
      case TimestampType | TimestampNTZType => // stored = epoch micros (INT64)
        stored.toLong.compare(lit.asInstanceOf[Number].longValue())
      case DateType => // stored = epoch days (INT32)
        stored.toInt.compare(lit.asInstanceOf[Number].intValue())
      case BooleanType =>
        stored.toBoolean.compare(lit.asInstanceOf[Boolean])
      case _ => throw new MatchError(t)
    }
  }.toOption

  private def mayMatch(f: AddFile, partitionCols: Seq[String],
                       e: Expression): Boolean = {

    def bounds(name: String): Option[(String, String)] =
      if (partitionCols.contains(name))
        f.partitionValues.get(name).map(v => (v, v))
      else for {
        st <- f.stats
        mn <- st.minValues.get(name)
        mx <- st.maxValues.get(name)
      } yield (mn, mx)

    /** keep(cmp(min,lit), cmp(max,lit)): can the file contain a match? */
    def boundsCheck(name: String, lv: Any, t: DataType,
                    keep: (Int, Int) => Boolean): Boolean =
      bounds(name) match {
        case Some((mn, mx)) =>
          (cmp(mn, lv, t), cmp(mx, lv, t)) match {
            case (Some(mnC), Some(mxC)) => keep(mnC, mxC)
            case _ => true
          }
        case None => true
      }

    def decide(l: Expression, r: Expression,
               keep: (Int, Int) => Boolean): Boolean =
      (attrName(l), litValue(r), attrName(r), litValue(l)) match {
        case (Some(name), Some((lv, t)), _, _) =>
          boundsCheck(name, lv, t, keep)
        case (_, _, Some(name), Some((lv, t))) =>
          // lit op attr ≡ attr (flipped op) lit → mirror comparisons
          boundsCheck(name, lv, t, (mnC, mxC) => keep(-mxC, -mnC))
        case _ => true
      }

    e match {
      case EqualTo(l, r) => decide(l, r, (mnC, mxC) => mnC <= 0 && mxC >= 0)
      case LessThan(l, r) => decide(l, r, (mnC, _) => mnC < 0)
      case LessThanOrEqual(l, r) => decide(l, r, (mnC, _) => mnC <= 0)
      case GreaterThan(l, r) => decide(l, r, (_, mxC) => mxC > 0)
      case GreaterThanOrEqual(l, r) => decide(l, r, (_, mxC) => mxC >= 0)
      case In(a, list) if list.forall(_.foldable) =>
        attrName(a) match {
          case Some(name) => list.exists(v =>
            litValue(v).forall { case (lv, t) =>
              boundsCheck(name, lv, t, (mnC, mxC) => mnC <= 0 && mxC >= 0)
            })
          case None => true
        }
      case StartsWith(l, r) =>
        (attrName(l), litValue(r)) match {
          case (Some(name), Some((p: UTF8String, StringType))) =>
            val prefix = p.toString
            bounds(name) match {
              case Some((mn, mx)) =>
                // matches form the interval [prefix, prefixUpper):
                // file range [mn,mx] must intersect it. Footer bounds
                // stay valid under parquet stat truncation (truncated
                // min is ≤ data, truncated max ≥ data), so this only
                // ever keeps extra files, never drops a match.
                // Compare as UTF8String (code-point order): the footer
                // min/max were written in UTF-8 byte order, and Java
                // String.compareTo (UTF-16 unit order) disagrees with
                // it between supplementary chars and [U+E000,U+FFFF].
                UTF8String.fromString(mx)
                    .compareTo(UTF8String.fromString(prefix)) >= 0 &&
                  prefixUpper(prefix).forall(u => UTF8String.fromString(mn)
                    .compareTo(UTF8String.fromString(u)) < 0)
              case None => true
            }
          case _ => true
        }
      case IsNull(a) =>
        attrName(a) match {
          // a partition column's value is constant per file; null
          // partitions surface as the default-partition dir — keep
          case Some(name) if !partitionCols.contains(name) =>
            f.stats.forall(st => st.nullCounts.get(name).forall(_ > 0))
          case _ => true
        }
      case IsNotNull(a) =>
        attrName(a) match {
          case Some(name) if !partitionCols.contains(name) =>
            f.stats.forall(st =>
              st.nullCounts.get(name).forall(_ < st.numRecords))
          case _ => true
        }
      case Or(l, r) =>
        mayMatch(f, partitionCols, l) || mayMatch(f, partitionCols, r)
      case _ => true // unsupported shape → cannot exclude
    }
  }

  /** Smallest string above every string with the given prefix (the
    * exclusive upper bound of the prefix interval): increment the last
    * non-￿ char and drop the tail. None when no such bound exists
    * (all-￿ prefix).
    */
  private def prefixUpper(prefix: String): Option[String] = {
    // increment the last incrementable CODE POINT (not UTF-16 unit) so
    // the bound sorts correctly in the same code-point order the stats
    // comparison uses; the surrogate range is skipped — no valid
    // string contains a lone surrogate, so U+E000 is the successor of
    // U+D7FF in achievable values.
    val cps = prefix.codePoints().toArray
    val i = cps.lastIndexWhere(_ < Character.MAX_CODE_POINT)
    if (i < 0) None
    else {
      var next = cps(i) + 1
      if (next >= Character.MIN_SURROGATE.toInt &&
          next <= Character.MAX_SURROGATE.toInt)
        next = Character.MAX_SURROGATE.toInt + 1
      Some(new String(cps, 0, i) + new String(Character.toChars(next)))
    }
  }
}
