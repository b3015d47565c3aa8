package graft.core

/** Engine configuration with the reference's validation rules
  * (`/root/reference/Common/common.py:76-454`): every "please enter valid…"
  * gate becomes a typed require. No Spark involvement.
  */
object Config {

  final case class MigrationConfig(
      extractPath: String,
      clientNumConn: Int = 2,
      batchSizeGb: Int = 0,
      compressedExtract: Boolean = true,
      nodes: Int = 1) {
    // common.py:297-300 — at least 2 client connections per node
    require(clientNumConn >= 2, "Client_Num_Conn must be an integer > 1")
    // common.py:303-313 — batches are ≥100 GiB or batching is off (0)
    require(batchSizeGb == 0 || batchSizeGb >= 100,
      "Batch_Size_GB must be 0 (disabled) or >= 100")
    // migration.py:175-176 — derived extract paths are capped at 128 bytes
    require(extractPath.getBytes("UTF-8").length < 90,
      "Extract_Path must be shorter than 90 bytes")
    require(nodes >= 1, "node count must be positive")
  }

  final case class LoadConfig(
      dataPath: String,
      coordConns: Int = 2,
      workerConns: Int = 2,
      validateSizes: Boolean = true) {
    require(coordConns >= 1 && workerConns >= 0, "connection counts invalid")
  }

  /** Worker restart policy (migration.py:2741-2743): Spark task retries
    * replace the monitor loop; keep the same budget. */
  val RestartLimit = 3

  /** Extract file cap (migration.py:2383-2391) and upload chunk
    * (copy_data_to_hdlfs.sh:16). */
  val ExtractFileCapBytes: Long = 3990000000L
  val UploadChunkBytes: Long = 95L * 1024 * 1024 * 1024
}
