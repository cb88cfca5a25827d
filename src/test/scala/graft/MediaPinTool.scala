package graft

/** Dev utility (test scope, run by hand): regenerate the media fixture
  * corpus in a THROWAWAY directory and print the writer-side md5 pins
  * (`MediaCorpus.expectedMd5` / `expectedFrameMd5` entries) for every
  * expected file. Used when ADDING fixtures; changing an existing
  * writer still fails the pinned-digest specs loudly, as designed.
  *
  *   sbt "Test/runMain graft.MediaPinTool"
  */
object MediaPinTool {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_media_pin")
    val saved = System.getProperty("java.io.tmpdir")
    // MediaCorpus writes under java.io.tmpdir — point it at a fresh dir
    // so stale files from an older corpus version can't leak into pins
    System.setProperty("java.io.tmpdir", tmp.toString)
    val dir = try graft.sources.MediaCorpus.ensure()
      finally System.setProperty("java.io.tmpdir", saved)
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    println("=== expectedMd5 ===")
    graft.sources.MediaCorpus.expected.foreach { e =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, e.fileName))
      println(s"""    "${e.fileName}" -> "${md5(bytes)}",""")
    }
    println("=== expectedFrameMd5 ===")
    graft.sources.MediaCorpus.expected.foreach { e =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, e.fileName))
      val frames = if (e.kind == "video") Seq(0, 3, 6) else Seq(0)
      frames.foreach { f =>
        println(s"""    ("${e.fileName}", $f, "${md5(bytes :+ f.toByte)}"),""")
      }
    }
  }
}
