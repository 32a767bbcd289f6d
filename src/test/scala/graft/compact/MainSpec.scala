package graft.compact

import org.scalatest.funsuite.AnyFunSuite

/** CLI arg surface (B15): flags parse to the config the orchestrator
  * actually reads, unknown flags and missing dir fail loudly, --help is
  * not an error path. */
class MainSpec extends AnyFunSuite {

  test("defaults + positional data-dir") {
    val Right(cfg) = Main.parseArgs(Seq("/data")): @unchecked
    assert(cfg.dataDir == "/data" && !cfg.dryRun && cfg.windowHours == 1 &&
      cfg.maxDesiredFileSizeBytes == (100L << 20) && cfg.bucketParallelism == 4)
  }

  test("all flags parse") {
    val Right(cfg) = Main.parseArgs(Seq("/d", "--hosts", "a,b", "--dry-run",
      "--verbose", "--window-hours", "24", "--target-file-size-mb", "64",
      "--time-column", "ts", "--parallelism", "8")): @unchecked
    assert(cfg.hosts == Seq("a", "b") && cfg.dryRun && cfg.verbose &&
      cfg.windowHours == 24 && cfg.maxDesiredFileSizeBytes == (64L << 20) &&
      cfg.timeColumn == "ts" && cfg.bucketParallelism == 8)
  }

  test("--zorder-col: single column and multi-axis comma list") {
    val Right(one) = Main.parseArgs(Seq("/d", "--zorder-col", "sensor")): @unchecked
    assert(one.zorderColumns == Seq("sensor"))
    val Right(two) = Main.parseArgs(
      Seq("/d", "--zorder-col", "host, sensor")): @unchecked
    assert(two.zorderColumns == Seq("host", "sensor"))
    val Right(none) = Main.parseArgs(Seq("/d")): @unchecked
    assert(none.zorderColumns.isEmpty)
  }

  test("errors: unknown flag, missing dir, trailing arg; --help is usage") {
    assert(Main.parseArgs(Seq("/d", "--nope")).isLeft)
    assert(Main.parseArgs(Seq("--dry-run")).isLeft)
    assert(Main.parseArgs(Seq("/d", "extra")).isLeft)
    val Left(msg) = Main.parseArgs(Seq("--help")): @unchecked
    assert(msg.startsWith("usage:"))
  }
}
