package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all specs: one local session per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  // One JVM-wide session for the whole forked test run.
  lazy val session: SparkSession = graft.core.Sessions.local("graft-test", cores = 4, shufflePartitions = 4)
}
