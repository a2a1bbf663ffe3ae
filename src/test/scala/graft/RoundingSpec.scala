package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-engine rounding discipline (r11): native fractional
  * `round(x, n)` disagrees between engines on half-way values — Spark
  * rounds the double's exact decimal expansion (BigDecimal HALF_UP),
  * DuckDB std::rounds the IEEE product x·10ⁿ. Measured on a 220k-value
  * adversarial battery: 2.2% disagreement for round(·, 4), plus one
  * real document at sf0.1 (q_quality_score, caught by the r11 sweep).
  * The floor form ⌊x·10ⁿ+½⌋/10ⁿ ran the same battery with ZERO
  * disagreements at scales 2/3/4/6 (`Num.roundAt` / SQL
  * `floor(x * 10^n + 0.5) / 10^n.0`). Integer-target `round(x)` is safe
  * (no multiply; both engines see the same double and round ties away
  * from zero).
  *
  * This spec is the standing guard: no oracle may reintroduce native
  * fractional round.
  */
class RoundingSpec extends AnyFunSuite {

  /** Top-level-comma argument count of the call whose '(' is at `open`. */
  private def argCount(s: String, open: Int): (Int, String) = {
    var depth = 0
    var i = open
    var args = 1
    val lastArg = new StringBuilder
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') {
        depth -= 1
        if (depth == 0) return (args, lastArg.toString.trim)
      } else if (c == ',' && depth == 1) { args += 1; lastArg.clear() }
      else if (args > 1) lastArg.append(c)
      i += 1
    }
    (args, lastArg.toString.trim)
  }

  test("no oracle SQL uses native fractional round(x, n)") {
    val offenders = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      val hits = scala.collection.mutable.ListBuffer.empty[String]
      var idx = sql.indexOf("round(")
      while (idx >= 0) {
        val wordStart = idx == 0 || !(sql.charAt(idx - 1).isLetterOrDigit ||
          sql.charAt(idx - 1) == '_' || sql.charAt(idx - 1) == '.')
        if (wordStart) {
          val (n, last) = argCount(sql, idx + 5)
          if (n == 2 && last.matches("[1-9]"))
            hits += sql.substring(idx, math.min(sql.length, idx + 60))
        }
        idx = sql.indexOf("round(", idx + 1)
      }
      hits.map(h => s"$name: $h")
    }
    assert(offenders.isEmpty,
      "native fractional round() diverges cross-engine on half-way " +
        "values — use floor(x * 10^n + 0.5) / 10^n.0 (Num.roundAt's SQL " +
        s"twin) instead:\n${offenders.mkString("\n")}")
  }

  test("no Spark-side query source uses native fractional round/bround") {
    // The mirror guard: an oracle-gated query whose SPARK side regresses
    // to native round(x, n) while its oracle keeps the floor form
    // diverges the same way. Scans the query/stream/serving sources
    // (non-comment, non-SQL lines). Known rows-only exceptions — no
    // oracle, so no cross-engine constraint — are listed explicitly.
    val allowed = Set(
      // annTrainedOn/annTrainedQ (ml_ann_trained, rows-only; IvfSpec
      // compares served === library, both sides bround-consistent):
      "round(dot(col(\"qv\"), col(\"vn\")), 3)",
      // ml_tfidf_similar (rows-only) keeps half-even like math.rint:
      "bround(graft.functions.DotProduct(a, b), 4)")
    val srcDirs = Seq("src/main/scala/graft/queries",
      "src/main/scala/graft/stream", "src/main/scala/graft/api",
      "src/main/scala/graft/llm")
    assume(srcDirs.forall(d => new java.io.File(d).isDirectory),
      "source tree not present in this packaging")
    val offenders = for {
      dir <- srcDirs
      f <- new java.io.File(dir).listFiles().toSeq
      if f.getName.endsWith(".scala")
      (line, i) <- java.nio.file.Files.readAllLines(f.toPath)
        .toArray(Array.empty[String]).toSeq.zipWithIndex
      t = line.trim
      if !t.startsWith("//") && !t.startsWith("*") && !t.startsWith("|") &&
        !t.startsWith("\"\"\"") && !t.startsWith("s\"\"\"")
      m <- "(?:^|[^\\w.])b?round\\(".r.findAllMatchIn(line)
      open = line.indexOf('(', m.start)
      (n, last) = argCount(line, open)
      if n == 2 && last.matches("[1-9]") &&
        !allowed.exists(line.contains)
    } yield s"${f.getName}:${i + 1}: $t"
    assert(offenders.isEmpty,
      "Spark-side fractional round/bround in a query source — use " +
        s"Num.roundAt (or add a rows-only exception):\n${offenders.mkString("\n")}")
  }
}
