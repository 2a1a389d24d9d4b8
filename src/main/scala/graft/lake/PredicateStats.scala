package graft.lake

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

/** In-process predicate-history accumulator for CLUSTER BY AUTO
  * (L120 — the observation half of predictive clustering): every
  * pruning-capable read records which schema columns its predicate
  * could skip files by. Counters live here per table root — a lock-
  * free bump on the read hot path, nothing touches disk — and each
  * OPTIMIZE under `graft.clusterAuto=true` DRAINS them into the
  * table's own log (`graft.clusterAuto.stats`), where history
  * accumulates durably across sessions. The recorded count is
  * "predicates that could prune by this column", not row or byte
  * counts: the quantity clustering can actually serve.
  */
object PredicateStats {

  private val counts =
    new ConcurrentHashMap[(String, String), AtomicLong]()

  def record(root: String, cols: Iterable[String]): Unit =
    cols.foreach { c =>
      val key = (root, c)
      counts.computeIfAbsent(key, _ => new AtomicLong()).incrementAndGet()
      // drain() races record(): it can remove the counter between our
      // computeIfAbsent and the increment, orphaning this observation.
      // Re-check membership after the bump and re-record on a miss —
      // the drain that removed it has already folded the PRE-increment
      // value, so re-adding 1 loses nothing and double-counts nothing
      // (the orphaned AtomicLong is unreachable to any future drain).
      if (!counts.containsKey(key))
        counts.computeIfAbsent(key, _ => new AtomicLong()).incrementAndGet()
    }

  /** Remove and return this root's counters (fold into the durable
    * property — a second drain sees only reads that arrived since;
    * record()'s post-increment re-check keeps concurrent observations
    * from vanishing into a just-removed counter).
    */
  def drain(root: String): Map[String, Long] = {
    val keys = counts.keySet().asScala.filter(_._1 == root).toSeq
    keys.flatMap(k => Option(counts.remove(k)).map(v => k._2 -> v.get()))
      .toMap
  }

  /** Render/parse of the durable property (`col:n;col:n`, sorted). */
  def render(m: Map[String, Long]): String =
    m.toSeq.sortBy { case (c, n) => (-n, c) }
      .map { case (c, n) => s"$c:$n" }.mkString(";")

  def parse(v: Option[String]): Map[String, Long] =
    v.toSeq.flatMap(_.split(';')).filter(_.nonEmpty).flatMap { e =>
      val i = e.lastIndexOf(':')
      if (i <= 0) None
      else scala.util.Try(e.substring(0, i) -> e.substring(i + 1).toLong)
        .toOption
    }.toMap
}
