package graft

import graft.tools.GraftCli

/** The CLI's flat-JSON config parse (no JSON dependency available —
  * it must handle the reference-shaped config file).
  */
class GraftCliSpec extends GraftSpec {

  test("parses the shipped example config") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("contrib/config.json.example")), "UTF-8")
    val cfg = GraftCli.parseConfig(text)
    assert(cfg("data") === "/root/testdata/sf0.001")
    assert(cfg("target") === "directory:///tmp/graft-backup")
    assert(cfg("as-of") === "2024-01-15")
    assert(cfg("shuffle_partitions") === "32")
  }

  test("parses string and numeric values; ignores malformed lines") {
    val cfg = GraftCli.parseConfig(
      """{"a": "x", "n": 42, "f": 2.5, broken, "b": "y"}""")
    assert(cfg === Map("a" -> "x", "n" -> "42", "f" -> "2.5", "b" -> "y"))
  }
}
