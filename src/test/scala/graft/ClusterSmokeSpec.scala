package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives ClusterSmoke in a subprocess: `local-cluster[2,4,2048]`
  * forks real executor JVMs, which must not happen inside the shared
  * test session's JVM (static master conf + forked workers). The
  * subprocess inherits this JVM's classpath and module flags; see
  * ClusterSmoke's scaladoc for what the mode uniquely exercises. */
class ClusterSmokeSpec extends AnyFunSuite {

  test("local-cluster[2 executor JVMs] serves the smoke set bit-for-bit") {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
      .toArray.map(_.toString).toSeq
    val addOpens = jvmArgs.zipWithIndex.flatMap {
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case (a, i) if a == "--add-opens" && i + 1 < jvmArgs.size =>
        Seq(a, jvmArgs(i + 1))
      case _ => Nil
    }
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-cp", System.getProperty("java.class.path"),
      "graft.ClusterSmoke", "/root/testdata/sf0.001")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
    val code = proc.waitFor()
    assert(code === 0, s"ClusterSmoke failed:\n${out.takeRight(4000)}")
    assert(out.contains(""""all":true"""), out.takeRight(4000))
    assert(out.contains(""""n_executors":2"""), out.takeRight(4000))
  }
}
