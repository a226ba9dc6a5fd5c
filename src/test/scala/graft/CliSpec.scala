package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI arg-parser + dry-run contract (reference:
  * lib/rika/cli/rika_command.rb:256-281 dry run,
  * lib/rika/cli/args_parser.rb invalid-flag taxonomy).
  */
class CliSpec extends AnyFunSuite {

  test("-l with a non-numeric argument is invalid_input, not a crash") {
    val (opts, issues) = Cli.parse(Vector("-l", "banana", "x.txt"))
    assert(opts.maxLen == -1)
    assert(issues == Vector(("invalid_input", "-l banana")))
    assert(opts.targets == Vector("x.txt"))
  }

  test("-l with a numeric argument sets maxLen") {
    val (opts, issues) = Cli.parse(Vector("-l", "64"))
    assert(opts.maxLen == 64 && issues.isEmpty)
  }

  test("-f selects the output format; bad format is invalid_input") {
    assert(Cli.parse(Vector("-f", "y"))._1.format == 'y')
    assert(Cli.parse(Vector("-f", "t"))._1.format == 't')
    assert(Cli.parse(Vector("-f", "J"))._1.format == 'J')
    val (opts, issues) = Cli.parse(Vector("-f", "zz"))
    assert(opts.format == 'j')
    assert(issues == Vector(("invalid_input", "-f zz")))
  }

  test("-n dry run prints plan + classified targets and exits 0") {
    val fixture = getClass.getResource("/fixtures/tiny.txt").getPath
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.main(Array("-n", "-l", "10", fixture))
    }
    val s = out.toString("UTF-8")
    assert(s.contains("Dry run"))
    assert(s.contains("maxLen=10"))
    assert(s.contains(s"file $fixture"))
    // dry run must not emit any extraction record
    assert(!s.contains("content_type"))
  }

  test("YAML format emits a parseable flat document") {
    val fixture = getClass.getResource("/fixtures/tiny.txt").getPath
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.main(Array("-f", "y", fixture))
    }
    val s = out.toString("UTF-8")
    assert(s.startsWith("---\n"))
    assert(s.contains("content_type: \"text/plain"))
    assert(s.contains("text: "))
  }
}
