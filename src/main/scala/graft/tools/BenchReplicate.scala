package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Set-level bench validity via the replication rule (r15 verdict
  * item 3, [[graft.Bench.replicationOk]]): reads ≥2 BENCH_LOCAL-style
  * JSON artifacts from the SAME tree, checks every pair for per-query
  * agreement, and writes `BENCH_REPLICATION.json` recording the
  * verdict. Individual sweeps keep their own `valid` stamps; this
  * artifact certifies the SET when single sweeps tripped marginal
  * canary bounds on an honest host.
  *
  *   sbt "runMain graft.tools.BenchReplicate sweep1.json sweep2.json [...]"
  */
object BenchReplicate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchReplicate <sweep.json> <sweep.json> [...]")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def sweep(p: String): (String, Map[String, Double], Double) = {
      val root = mapper.readTree(new String(
        Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8))
      val qs = root.get("queries").fields().asScala
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
      (p, qs, root.get("value").asDouble())
    }
    val sweeps = args.toSeq.map(sweep)
    val pairs = for {
      i <- sweeps.indices; j <- sweeps.indices if i < j
    } yield {
      val ok = graft.Bench.replicationOk(sweeps(i)._2, sweeps(j)._2)
      val common = sweeps(i)._2.keySet.intersect(sweeps(j)._2.keySet)
        .toSeq.filter(k => sweeps(i)._2(k) > 0 && sweeps(j)._2(k) > 0)
      val ratios = common.map(k => sweeps(i)._2(k) / sweeps(j)._2(k)).sorted
      val median = if (ratios.isEmpty) Double.NaN else ratios(ratios.size / 2)
      (i, j, ok, median)
    }
    val setValid = pairs.nonEmpty && pairs.forall(_._3)
    val pairJson = pairs.map { case (i, j, ok, m) =>
      f"""{"a":"${args(i)}","b":"${args(j)}","median_ratio":$m%.4f,"agree":$ok}"""
    }.mkString("[", ",", "]")
    val totals = sweeps.map(s => f"${s._3}%.3f").mkString("[", ",", "]")
    val json = s"""{"rule":"replication (>=2 same-tree sweeps agreeing; """ +
      s"""per-query median in [1/1.15,1.15], >=90% of queries in the """ +
      s"""canary band)","sweeps":${args.length},"totals":$totals,""" +
      s""""pairs":$pairJson,"set_valid":$setValid}"""
    Files.write(Paths.get("BENCH_REPLICATION.json"),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"BENCH_REPLICATION_JSON: $json")
  }
}
