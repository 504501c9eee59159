package graft

/** Clean-JVM wall-clock measurement of one registered query: fork a
  * fresh JVM (same classpath / --add-opens / heap bounds as the
  * caller) running [[Explain]] with min-of-2 passes and parse its
  * `wall=` line. This is the shared self-adjudication kernel: a bench
  * or probe reading taken inside a host CPU-throttle window is
  * re-measured minutes later in a process that shares none of the
  * parent's GC state, and BOTH numbers land in the artifact so no
  * prose adjudication is needed. Extracted from ScaleProbe's recheck
  * (r12 verdict ask #4) so round-close Bench runs can emit the same
  * `recheck` fields (r15 verdict ask #3).
  */
object CleanFork {

  /** Returns the fork's min-of-passes wall seconds, or None if the
    * fork failed or exceeded `timeoutSec` (it is then force-killed —
    * a hung fork must skip the recheck, not stall the run).
    */
  def wall(name: String, dir: String, cpus: String,
      timeoutSec: Long): Option[Double] = {
    val raw = scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments).asScala.toSeq
    // --add-opens arrives as two list entries ("--add-opens", "p=ALL…")
    // on some JVMs and one on others; rebuild pairwise from the raw list
    // (bounds-guarded: a malformed trailing "--add-opens" with no value
    // must degrade to skipping the flag, not abort the whole run)
    val opens = raw.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" && i + 1 < raw.length =>
        Seq(a, raw(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
    }.flatten
    // carry BOTH heap bounds; if the parent has no -Xms, synthesize
    // one equal to -Xmx — a fork growing from the default initial
    // heap pays a GC-adaptation tax precisely on the shuffle-heavy
    // queries the recheck targets (measured: minhash 100x steady
    // state 101.7 s growing vs 26.8 s pre-sized, same window)
    val mem0 = raw.filter(a =>
      a.startsWith("-Xmx") || a.startsWith("-Xms"))
    val mem =
      if (mem0.exists(_.startsWith("-Xms"))) mem0
      else mem0 ++ mem0.collectFirst {
        case a if a.startsWith("-Xmx") => "-Xms" + a.stripPrefix("-Xmx")
      }
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val cmd = Seq(javaBin) ++ opens ++ mem ++ Seq(
      "-cp", sys.props("java.class.path"), "graft.Explain", name, dir)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    // min-of-2 inside the fork: pass 1 absorbs the fork's cold
    // codegen/scan so the recheck measures steady state, not start-up
    pb.environment().put("SPARK_GRAFT_EXPLAIN_PASSES", "2")
    pb.redirectErrorStream(true)
    // the fork's output goes to a FILE, not a pipe: readAllBytes on a
    // live pipe blocks until the child closes its end, which made the
    // waitFor timeout + destroyForcibly path unreachable for a hung
    // fork (the run would stall forever instead of skipping the
    // recheck)
    val tmp = java.io.File.createTempFile("graft-recheck-", ".log")
    try {
      pb.redirectOutput(tmp)
      val p = pb.start()
      if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly()
        p.waitFor()
        return None
      }
      val out = new String(
        java.nio.file.Files.readAllBytes(tmp.toPath), "UTF-8")
      """wall=([0-9.]+) s""".r.findFirstMatchIn(out)
        .map(_.group(1).toDouble)
    } catch { case _: Throwable => None }
    finally tmp.delete()
  }
}
