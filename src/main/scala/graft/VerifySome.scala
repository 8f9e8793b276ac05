package graft
/** Back-compat alias: [[Verify]] itself now takes optional query names
  * after sfDir/outDir. */
object VerifySome {
  def main(args: Array[String]): Unit = Verify.main(args)
}
