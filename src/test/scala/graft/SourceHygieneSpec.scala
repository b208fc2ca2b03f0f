package graft

import org.scalatest.funsuite.AnyFunSuite

/** Rejects raw control bytes in Scala sources. A NUL inside a string
  * literal breaks the Scala scanner with a misleading downstream error
  * AND flips git/ripgrep into binary mode, hiding the file from diff
  * and search — the exact failure that shipped a red snapshot once.
  * Backslash-u escapes are the accepted spelling.
  */
class SourceHygieneSpec extends AnyFunSuite {

  test("no raw control bytes in Scala sources") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(Paths.get("src"))
    val bad =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .flatMap { p =>
          val bytes = Files.readAllBytes(p)
          val i = bytes.indexWhere(b =>
            b >= 0 && b < 0x20 && b != '\t' && b != '\n' && b != '\r')
          if (i >= 0) Some(f"$p: 0x${bytes(i)}%02x at byte $i") else None
        }.toList
      finally walk.close()
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
