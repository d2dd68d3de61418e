package graft

import org.scalatest.funsuite.AnyFunSuite

/** The README's deploy claim, verified end-to-end: the string conf
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the exact
  * submit shape) must make representative operators servable PURELY
  * through `spark.sql`. The conf is STATIC — it only takes effect on
  * a fresh SparkContext — so the check runs in a subprocess JVM
  * (SqlDeployCheck) with this test JVM's classpath and module flags,
  * comparing each SQL result bit-for-bit against the library operator:
  * q10 (relational core), x02 (dedup chain over graft_* functions),
  * x33b (index-served BM25 probe over the index views). */
class SqlDeploySpec extends AnyFunSuite {

  test("spark.sql.extensions session serves q10/x02/x33b from pure SQL") {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
      .toArray.map(_.toString).toSeq
    // --add-opens arrives either fused ("--add-opens=pkg=ALL-UNNAMED")
    // or as a flag + value pair — forward both shapes
    val addOpens = jvmArgs.zipWithIndex.flatMap {
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case (a, i) if a == "--add-opens" && i + 1 < jvmArgs.size =>
        Seq(a, jvmArgs(i + 1))
      case _ => Nil
    }
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-cp", System.getProperty("java.class.path"),
      "graft.SqlDeployCheck", "/root/testdata/sf0.001")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
    val code = proc.waitFor()
    assert(code === 0, s"SqlDeployCheck failed:\n${out.takeRight(4000)}")
    assert(out.contains("SQL_DEPLOY_OK"), out.takeRight(4000))
    assert(out.contains("q10 OK") && out.contains("x02 OK") &&
      out.contains("x33b OK"), out.takeRight(4000))
  }
}
