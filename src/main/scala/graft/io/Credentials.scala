package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.security.SecureRandom
import java.util.Base64
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}
import javax.crypto.{Cipher, SecretKeyFactory}

/** Driver-side credential encryption — the reference's
  * encrypt_decrypt.py:24-39 utility (PBKDF2-derived AES key) re-expressed
  * over the JDK crypto API. Not a query operator: this protects
  * connection secrets (JDBC passwords) at rest in job config.
  *
  * Differences from the reference, deliberate: the key derivation uses
  * PBKDF2WithHmacSHA256 (the reference's SHA1 variant is legacy), the
  * mode is AES-GCM rather than CBC — authenticated decryption fails
  * DETERMINISTICALLY on a wrong key, where CBC padding validates
  * spuriously with probability ~2^-8 and returns garbage — the IV is
  * random per message and carried WITH the ciphertext (a fixed IV leaks
  * message equality), and the salt is caller-provided — nothing secret
  * lives in code.
  */
object Credentials {

  private val Iterations = 65536
  private val KeyBits = 256
  private val random = new SecureRandom()

  private def deriveKey(passphrase: Array[Char], salt: Array[Byte]): SecretKeySpec = {
    val factory = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    val key = factory.generateSecret(
      new PBEKeySpec(passphrase, salt, Iterations, KeyBits)).getEncoded
    new SecretKeySpec(key, "AES")
  }

  /** Encrypt to base64(iv ++ ciphertext ++ tag). */
  def encrypt(plain: String, passphrase: String, salt: Array[Byte]): String = {
    val iv = new Array[Byte](12) // GCM-standard 96-bit nonce
    random.nextBytes(iv)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, deriveKey(passphrase.toCharArray, salt),
      new GCMParameterSpec(128, iv))
    val ct = cipher.doFinal(plain.getBytes(UTF_8))
    Base64.getEncoder.encodeToString(iv ++ ct)
  }

  /** Decrypt base64(iv ++ ciphertext ++ tag); the GCM tag check makes a
    * wrong passphrase/salt throw AEADBadTagException every time, never
    * return garbage. */
  def decrypt(encoded: String, passphrase: String, salt: Array[Byte]): String = {
    val raw = Base64.getDecoder.decode(encoded)
    require(raw.length > 12, "ciphertext too short to carry an IV")
    val (iv, ct) = raw.splitAt(12)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, deriveKey(passphrase.toCharArray, salt),
      new GCMParameterSpec(128, iv))
    new String(cipher.doFinal(ct), UTF_8)
  }
}
