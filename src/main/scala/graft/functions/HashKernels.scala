package graft.functions

/** Wrap-exact integer hash finalizers from the reference
  * (src/Common/HashTable/Hash.h:499 intHash32, :487 intHash64;
  * salts applied per src/Functions/FunctionsHashing.h:173-192).
  *
  * JVM long arithmetic wraps mod 2^64 exactly like C++ UInt64 for
  * `*`, `+`, `^`, `<<`; `>>>` is the unsigned right shift. These are
  * invoked from the SQL registry via StaticInvoke — a single static
  * call that whole-stage codegen inlines, kept out of Catalyst tree
  * form because ANSI mode would reject the intentional overflow of
  * the multiply/add steps. */
object HashKernels {

  /** intHash64(x ^ seed): the murmur-style 64-bit finalizer. Returns the
    * UInt64 result's signed-long bit pattern (callers render unsigned). */
  def intHash64(x0: Long): Long = {
    var x = x0 ^ 0x4CF2D2BAAE6DA887L
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** intHash32<salt>(key): 64-bit mix keyed down to UInt32 (Hash.h:499). */
  def intHash32(key0: Long): Long = {
    var key = key0 ^ 0x75D9543DE018BF45L
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key & 0xFFFFFFFFL
  }
}
